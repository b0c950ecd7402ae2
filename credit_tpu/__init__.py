"""credit-tpu: a TPU-native (JAX/XLA/Pallas) AI-NWP framework.

A from-scratch re-design of the capabilities of NCAR/miles-credit (CREDIT)
for TPU pod slices: autoregressive AI weather emulators (WXFormer/CrossFormer,
FuXi, ...) on global lat-lon-level grids with conservation postblocks,
stochastic physics, CRPS-family ensemble losses, and a GSPMD/shard_map
parallelism stack (dp x tp x domain) replacing torch DDP/FSDP/TP/domain
parallelism.

Layout conventions (TPU-first, unlike the reference's torch NCHW):
  - spatial tensors are channels-last: (batch, lat, lon, channel) [NHWC]
  - multi-frame inputs are (batch, time, lat, lon, channel)
  - channel order within the flat channel axis is governed by
    `credit_tpu.data.channels.ChannelSchema` (reference:
    credit/datasets/gen_2/channel_utils.py:206).
"""

__version__ = "0.1.0"
