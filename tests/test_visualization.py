"""Visualization helpers (reference: credit/animation.py:22-56 unit
conversions, credit/visualization_tools.py:95-201 range/colormap/panel
policies)."""

import numpy as np

from credit_tpu.visualization import (colormap_extend, convert_for_display,
                                      gp_to_height_dam, k_to_c, k_to_f,
                                      kgkg_to_gkg, pa_to_hpa, panel_grid,
                                      pick_colormap, round_range,
                                      variable_range)


def test_unit_conversions():
    assert kgkg_to_gkg(0.012) == 12.0
    assert k_to_c(273.15) == 0.0
    assert k_to_f(273.15) == 32.0
    np.testing.assert_allclose(pa_to_hpa(101325.0), 1013.25)
    np.testing.assert_allclose(gp_to_height_dam(9.80665 * 5500.0), 550.0)


def test_convert_for_display_prefix_match():
    arr = np.array([300.0])
    out, units = convert_for_display("T_L5", arr)
    np.testing.assert_allclose(out, [26.85])
    assert units == "degC"
    out, units = convert_for_display("SP", np.array([100000.0]))
    np.testing.assert_allclose(out, [1000.0])
    assert units == "hPa"
    # longest prefix wins: VAR_2T is Kelvin, not a "V" wind
    _, units = convert_for_display("VAR_2T", arr)
    assert units == "degC"
    out, units = convert_for_display("unknown_var", arr)
    assert units == "" and out is arr


def test_variable_range_methods():
    rng = np.random.default_rng(0)
    x = rng.normal(10.0, 2.0, 10000)
    lo, hi = variable_range(x, "mean_std", n_std=3)
    assert 3.0 < lo < 5.0 and 15.0 < hi < 17.0
    lo, hi = variable_range(x, "minmax")
    assert lo == x.min() and hi == x.max()


def test_round_range_outward():
    lo, hi = round_range(0.123, 9.87)
    assert lo <= 0.123 and hi >= 9.87
    # idempotent-ish: spans stay sane
    assert hi - lo < 2 * (9.87 - 0.123)


def test_colormap_extend_policy():
    assert colormap_extend((0, 1), (0, 1)) == "neither"
    assert colormap_extend((-1, 1), (0, 1)) == "min"
    assert colormap_extend((0, 2), (0, 1)) == "max"
    assert colormap_extend((-1, 2), (0, 1)) == "both"


def test_panel_grid():
    assert panel_grid(1) == (1, 1)
    assert panel_grid(2) == (1, 2)
    assert panel_grid(4) == (2, 2)
    assert panel_grid(6) == (2, 3)
    r, c = panel_grid(11)
    assert r * c >= 11


def test_pick_colormap_families():
    assert pick_colormap("U_L3") == "RdBu_r"
    assert pick_colormap("Q_L0") == "viridis"
    assert pick_colormap("T_L5") == "turbo"


def test_get_saved_field_roundtrip(tmp_path):
    """Saved-rollout field server endpoint (reference:
    applications/data_server.py base64 payload contract)."""
    import base64
    import os

    from credit_tpu.serve import get_saved_field
    from credit_tpu.utils.ncio import Dataset, Variable

    run = "2020-01-01T00Z"
    os.makedirs(tmp_path / run)
    arr = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
    Dataset({"T2": Variable(("time", "lat", "lon"), arr)},
            coords={"time": np.array([0.0]),
                    "lat": np.arange(3, dtype=np.float64),
                    "lon": np.arange(4, dtype=np.float64)}).to_netcdf(
        str(tmp_path / run / f"pred_{run}_006.nc"))
    out = get_saved_field(str(tmp_path), run, 6, "T2")
    assert out["status"] == "ok" and out["shape"] == [3, 4]
    dec = np.frombuffer(base64.b64decode(out["data"]),
                        dtype=out["dtype"]).reshape(out["shape"])
    np.testing.assert_array_equal(dec, arr[0])
    missing = get_saved_field(str(tmp_path), run, 99, "T2")
    assert "not found" in missing["status"]
    badvar = get_saved_field(str(tmp_path), run, 6, "NOPE")
    assert "not in" in badvar["status"]
