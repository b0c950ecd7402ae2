"""Full-scale (0.25 deg, 124M-param) converted-checkpoint parity vs the
reference PyTorch CrossFormer, run in place as the oracle.

North-star evidence (BASELINE.md): a converted flagship checkpoint must
reproduce the reference forward pass allclose at the real 721x1440 grid —
the regular test suite proves this at toy scale; this manual run proves it
at the exact flagship configuration (quadrant-decomposed embed, earth
padding 39/40, windows 10/5/2/1).

Run on CPU (slow, ~10-40 min): PALLAS_AXON_POOL_IPS= python tests/manual/flagship_parity.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from bench import CONF_025
    from credit_tpu.convert_torch import convert_crossformer
    from credit_tpu.models import load_model
    from tests.reference_oracle import build_reference_crossformer

    torch.manual_seed(42)
    kw = {k: v for k, v in CONF_025.items() if k != "type"}
    # fresh-init spectral norm (one torch power iteration) underestimates
    # sigma at flagship widths: activations blow up to ~5e17 and fp32
    # reduction-order noise amplifies chaotically through 28 layers, making
    # ANY comparison meaningless (measured rel ~0.9 for two bit-equivalent
    # formulations). Trained checkpoints have converged sigmas; for the
    # structural full-scale test, compare on raw weights instead.
    kw["use_spectral_norm"] = False
    # CONF_025 relies on the (shared) default dim_head=32; pin it explicitly
    # so the oracle's TINY_KW default (16) cannot leak in — a silent
    # head-count mismatch converts cleanly (same weight shapes) but computes
    # a different model (cost one long debugging session to find)
    kw["dim_head"] = 32
    # the reference constructor takes the same keys (tuples for sequences)
    ref_kw = {k: (tuple(tuple(e) if isinstance(e, list) else e for e in v)
                  if isinstance(v, list) else v) for k, v in kw.items()}
    log("building reference torch flagship (124M params)...")
    ref, full_kw = build_reference_crossformer(**ref_kw)
    n_par = sum(p.numel() for p in ref.parameters())
    log(f"reference params: {n_par / 1e6:.1f}M")

    conf = {"model": {"type": "crossformer", **kw}}
    mine = load_model(conf)
    cin = mine.base_input_channels
    log(f"initializing jax model (C_in={cin})...")
    x0 = jnp.zeros((1, 1, 721, 1440, cin), jnp.float32)
    # REAL init (not eval_shape+zeros): convert_crossformer overwrites the
    # torch-derived leaves but any leaf it leaves untouched must hold its
    # proper initialization (zeros there silently wreck spectral norm)
    t0 = time.time()
    variables = jax.jit(mine.init)(jax.random.PRNGKey(0), x0)
    log(f"init: {time.time() - t0:.0f}s")
    log("converting torch state_dict...")
    variables = convert_crossformer(ref.state_dict(), variables, strict=True)

    rng = np.random.default_rng(0)
    x_np = (rng.standard_normal((1, cin, 1, 721, 1440)) * 0.5).astype(np.float32)

    log("running torch forward...")
    t0 = time.time()
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x_np)).numpy()
    log(f"torch forward: {time.time() - t0:.0f}s")
    del ref

    log("running jax forward...")
    x_mine = jnp.asarray(np.transpose(x_np, (0, 2, 3, 4, 1)))
    t0 = time.time()
    y_mine = np.asarray(jax.jit(mine.apply)(variables, x_mine))
    log(f"jax forward (incl. compile): {time.time() - t0:.0f}s")
    y_mine_t = np.transpose(y_mine, (0, 4, 1, 2, 3))

    scale = np.abs(y_ref).max()
    err = np.abs(y_mine_t - y_ref).max()
    rel = err / scale
    log(f"max |ref|={scale:.4f}  max abs err={err:.3e}  rel={rel:.3e}")
    assert y_ref.shape == y_mine_t.shape, (y_ref.shape, y_mine_t.shape)
    assert rel < 2e-3, f"flagship parity FAILED: rel={rel:.3e}"
    log("FLAGSHIP PARITY OK")


if __name__ == "__main__":
    main()
