"""Caption zoo decoders: factory + teacher-forced NLL shape/finiteness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lang2seg_tpu.config import ModelConfig
from lang2seg_tpu.models.caption_zoo import setup_captioner


@pytest.mark.parametrize("name", ["att2in2", "show_tell", "fc", "topdown",
                                  "show_attend_tell", "adaatt"])
def test_zoo_decoder_nll(name):
    m = ModelConfig()
    m.caption_model = name
    m.cap_vocab_size = 40
    m.cap_rnn_size = 32
    m.cap_input_encoding_size = 32
    m.cap_att_hid_size = 32
    m.cap_fc_feat_size = 64
    m.cap_att_feat_size = 64
    capt = setup_captioner(m)

    b, L, t = 2, 9, 8
    fc = jnp.ones((b, 64))
    att = jnp.ones((b, L, 64))
    seq = jnp.zeros((b, t), jnp.int32).at[:, 1:5].set(3)
    mask = jnp.zeros((b, t)).at[:, :6].set(1.0)
    params = capt.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       fc, att, seq, mask, False,
                       method=type(capt).teacher_forced_nll)
    nll = capt.apply(params, fc, att, seq, mask, False,
                     method=type(capt).teacher_forced_nll)
    v = float(nll)
    assert np.isfinite(v)
    assert abs(v - np.log(41)) < 2.5   # roughly-uniform at init


def test_factory_rejects_unknown():
    m = ModelConfig()
    m.caption_model = "nope"
    with pytest.raises(ValueError):
        setup_captioner(m)