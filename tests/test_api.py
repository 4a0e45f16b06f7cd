"""Public class-style codec API (codec/api.py): encode/decode through every
mode, decode dispatching on the self-describing container header."""

import numpy as np
import pytest
import jax

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.codec.api import (
    PseudoDecoder, PseudoEncoder)

CFG = dict(valid_dim=8, channels=8, code_channels=8, npart=4)
HW = (64, 128)


@pytest.mark.parametrize("mode", ["scan", "dense", "incremental"])
def test_api_roundtrip(tmp_path, mode):
    params = cmpnet_init(jax.random.PRNGKey(0), CMPNetConfig(**CFG))
    enc = PseudoEncoder(CFG["valid_dim"], params, channels=CFG["channels"],
                        code_channels=CFG["code_channels"],
                        npart=CFG["npart"], mode=mode, batch=1, lanes=8)
    dec = PseudoDecoder(CFG["valid_dim"], params, channels=CFG["channels"],
                        code_channels=CFG["code_channels"],
                        npart=CFG["npart"])
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3) + HW)
    fn = str(tmp_path / "c.bin")
    size = enc(x, fn)
    assert size > 0
    rec = dec(fn, HW)
    assert rec.shape == (1, 3) + HW
    # decoding must be deterministic
    rec2 = dec(fn, HW)
    np.testing.assert_array_equal(rec, rec2)
