"""Observational / regional-NWP dataset sources: GOES, HRRR, MRMS.

Re-designs of the reference's gen2 observation readers on the shared
clocked-zarr base (reference: credit/datasets/gen_2/goes.py:371 GOESDataset
— ABI imager bands on the fixed satellite projection, no vertical levels;
gen_2/hrrr.py:677 HRRRDataset — HRRR on its Lambert-conformal grid with
hybrid levels; gen_2/mrms.py:76 MRMSDataset — 2-D radar mosaics). All three
inherit the master-clock mapping, chunk-gather reads, channel stacking, and
datetime addressing from ZarrSourceDataset; what differs is the store
convention (coordinate names, default buckets, level handling).

Projection note: the reference carries lat/lon 2-D coordinate grids for the
GOES imager projection and HRRR's Lambert grid (latlon2d_dir). In the
flat-tensor design the model grid IS the native store grid (regional
configs set image_height/width to it); reprojection onto a different grid
composes through the 'regrid' preblock with the store's 2-D coordinates.
"""

from __future__ import annotations

from credit_tpu import registry
from credit_tpu.data.era5 import ZarrSourceDataset

GOES_PATH = "gs://gcp-public-data-goes-16/ABI-L2-CMIPF.zarr"
HRRR_PATH = "s3://hrrrzarr/sfc.zarr"
MRMS_PATH = "gs://mrms-zarr/precip_rate.zarr"


@registry.register("dataset", "goes")
class GOESDataset(ZarrSourceDataset):
    """GOES ABI imager bands (reference: gen_2/goes.py:371): 2-D channels
    on the fixed satellite grid; `time_coord` defaults to GOES's 't'."""

    dataset_type = "goes"

    def __init__(self, schema, src_conf, data_conf, **kw):
        src_conf = dict(src_conf)
        src_conf.setdefault("time_coord", "t")
        super().__init__(schema, src_conf, data_conf, **kw)

    @staticmethod
    def default_store(src_conf: dict) -> str:
        return GOES_PATH


@registry.register("dataset", "hrrr")
@registry.register("dataset", "HRRR")
class HRRRDataset(ZarrSourceDataset):
    """HRRR regional NWP on its native Lambert-conformal grid
    (reference: gen_2/hrrr.py:677): 3-D variables select hybrid levels via
    the 'level' coordinate; 2-D surface fields pass through."""

    dataset_type = "hrrr"

    @staticmethod
    def default_store(src_conf: dict) -> str:
        return HRRR_PATH


@registry.register("dataset", "mrms")
class MRMSDataset(ZarrSourceDataset):
    """MRMS radar mosaics (reference: gen_2/mrms.py:76): 2-D
    precipitation-rate / reflectivity products, typically diagnostic-only
    targets for regional training."""

    dataset_type = "mrms"

    @staticmethod
    def default_store(src_conf: dict) -> str:
        return MRMS_PATH
