"""Native (C++) runtime components.

`fastload` is the threaded chunk reader/decoder behind the zarr data path
(see fastload.cpp). The shared library is compiled on demand with the
system toolchain and cached next to the source; every consumer falls back
to the pure-Python path when a compiler is unavailable, so the package
stays importable anywhere.
"""

from credit_tpu.native.fastload import (  # noqa: F401
    available,
    decode_batch,
    read_decode_batch,
)
