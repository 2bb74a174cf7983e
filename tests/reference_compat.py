"""Import helpers for numerical-parity tests against the PyTorch
reference at /root/reference (read-only).

The reference package imports azfuse/boto3 at module scope; those are
not installed here, so we inject minimal stubs before importing the
torch-only model modules we compare against.  Nothing from the
reference is copied — it is executed as an oracle.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def skip_unless_reference_available():
    """Module-level pytest skip when the read-only reference checkout is
    absent (e.g. public CI runners) — oracle tests need it to execute."""
    import os.path as op

    if not op.isdir(REFERENCE_ROOT):
        import pytest

        pytest.skip(
            "reference checkout not available at {}".format(REFERENCE_ROOT),
            allow_module_level=True,
        )


def import_reference_modules():
    """Returns (clip_model_module, decoder_module) from the reference."""
    skip_unless_reference_available()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _stub("azfuse", File=object)
    _stub("boto3", client=lambda *a, **k: None, resource=lambda *a, **k: None)
    botocore = _stub("botocore")
    exceptions = _stub("botocore.exceptions", ClientError=Exception)
    botocore.exceptions = exceptions
    from generativeimage2text.layers.CLIP import model as clip_model
    from generativeimage2text.layers import decoder

    return clip_model, decoder
