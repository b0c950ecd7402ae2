"""Model registry and builder.

`load_model(conf)` mirrors the reference's registry contract
(reference: credit/models/__init__.py:291): `conf['model']['type']` selects a
registered architecture; remaining model-section keys are passed as kwargs.
"""

from __future__ import annotations

from credit_tpu import registry


def load_model(conf: dict):
    """Build the model module (flax) from a gen2-style config dict."""
    # import for registration side effects
    from credit_tpu.models import crossformer as _cf  # noqa: F401
    from credit_tpu.models import debugger as _dbg  # noqa: F401
    from credit_tpu.models import fuxi as _fx  # noqa: F401
    from credit_tpu.models import graph as _gr  # noqa: F401
    from credit_tpu.models import wxformer_next as _nx  # noqa: F401
    from credit_tpu.models import sdl as _sdl  # noqa: F401
    from credit_tpu.models import swin as _sw  # noqa: F401
    from credit_tpu.models import unet as _un  # noqa: F401
    from credit_tpu.models import diffusion_heads as _dh  # noqa: F401
    from credit_tpu.models import regional as _rg  # noqa: F401
    from credit_tpu.models import variants as _va  # noqa: F401

    mconf = dict(conf["model"])
    mtype = mconf.pop("type")
    cls = registry.get("model", mtype)
    return cls.from_config({"model": {**mconf, "type": mtype}, **{k: v for k, v in conf.items() if k != "model"}})
