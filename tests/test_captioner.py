"""Captioner (att2in2) unit tests: teacher forcing, NLL criterion
semantics, greedy sampling, beam search."""

import numpy as np
import jax
import jax.numpy as jnp

from lang2seg_tpu.models.captioner import Att2In2Captioner


def make_capt(vocab=50, seq_len=8):
    return Att2In2Captioner(vocab_size=vocab, seq_length=seq_len,
                            rnn_size=64, input_encoding_size=64,
                            att_hid_size=64, fc_feat_size=128,
                            att_feat_size=128, drop_prob_lm=0.5)


def init_capt(capt, b=3, L=16):
    fc = jnp.ones((b, 128))
    att = jnp.ones((b, L, 128))
    seq = jnp.zeros((b, 10), jnp.int32).at[:, 1:5].set(7)
    mask = jnp.zeros((b, 10)).at[:, :6].set(1.0)
    params = capt.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       fc, att, seq, mask,
                       method=Att2In2Captioner.teacher_forced_nll)
    return params, fc, att, seq, mask


def test_teacher_forced_nll_finite_and_near_uniform():
    capt = make_capt()
    params, fc, att, seq, mask = init_capt(capt)
    nll = capt.apply(params, fc, att, seq, mask, False,
                     method=Att2In2Captioner.teacher_forced_nll)
    v = float(nll)
    assert np.isfinite(v)
    # fresh init ~ uniform over vocab+1
    assert abs(v - np.log(51)) < 1.0


def test_nll_masked_mean_semantics():
    capt = make_capt()
    params, fc, att, seq, mask = init_capt(capt)
    logps = capt.apply(params, fc, att, seq, False,
                       method=Att2In2Captioner.teacher_forced_logprobs)
    lp = np.asarray(logps)
    tgt = np.asarray(seq)[:, 1:]
    m = np.asarray(mask)[:, 1:1 + lp.shape[1]]
    manual = -(np.take_along_axis(lp, tgt[..., None], -1)[..., 0] * m).sum() \
        / m.sum()
    got = float(capt.apply(params, fc, att, seq, mask, False,
                           method=Att2In2Captioner.teacher_forced_nll))
    np.testing.assert_allclose(got, manual, rtol=1e-5)


def test_greedy_sample_shapes_and_termination():
    capt = make_capt()
    params, fc, att, seq, mask = init_capt(capt)
    out_seq, lps = capt.apply(params, fc, att,
                              method=Att2In2Captioner.sample_greedy)
    assert out_seq.shape == (3, 8)
    s = np.asarray(out_seq)
    # after the first 0 (EOS), everything stays 0
    for row in s:
        zeros = np.where(row == 0)[0]
        if len(zeros):
            assert (row[zeros[0]:] == 0).all()


def test_beam_search_beats_or_matches_greedy():
    capt = make_capt()
    params, fc, att, seq, mask = init_capt(capt)
    beam_seq, beam_score = capt.apply(params, fc, att, 5,
                                      method=Att2In2Captioner.sample_beam)
    assert beam_seq.shape == (3, 8)
    assert np.isfinite(np.asarray(beam_score)).all()
    # UNK (last index) suppressed
    assert (np.asarray(beam_seq) != 50).all()


def test_scheduled_sampling_schedule_values():
    from lang2seg_tpu.engine.train_captioner import scheduled_sampling_prob
    # disabled
    assert scheduled_sampling_prob(100, start=-1) == 0.0
    # reference defaults: start, +0.05 every 5 epochs, cap 0.25
    assert scheduled_sampling_prob(0, start=0) == 0.0
    assert scheduled_sampling_prob(4, start=0) == 0.0
    assert scheduled_sampling_prob(5, start=0) == 0.05
    assert scheduled_sampling_prob(14, start=0) == 0.10
    assert scheduled_sampling_prob(25, start=0) == 0.25
    assert scheduled_sampling_prob(500, start=0) == 0.25   # capped
    assert scheduled_sampling_prob(3, start=10) == 0.0     # before start


def test_ss_prob_changes_sampling_behavior():
    """With ss_prob=1 every step >= 1 feeds a sampled token instead of the
    ground truth -> teacher-forced log-probs must differ from ss_prob=0
    (AttModel.py:76-88). Passed as a traced override (no recompile)."""
    capt = make_capt()
    params, fc, att, seq, mask = init_capt(capt)
    seq = seq.at[:, 1:8].set(jnp.asarray([3, 9, 2, 7, 5, 1, 4]))

    def run(p):
        return capt.apply(params, fc, att, seq, True,
                          rngs={"dropout": jax.random.PRNGKey(2)},
                          ss_prob=jnp.asarray(p, jnp.float32),
                          method=Att2In2Captioner.teacher_forced_logprobs)

    jr = jax.jit(run)
    lp0 = np.asarray(jr(0.0))
    lp1 = np.asarray(jr(1.0))
    lp0b = np.asarray(jr(0.0))
    np.testing.assert_allclose(lp0, lp0b, rtol=1e-6)   # deterministic
    # step 0 consumes BOS either way; later steps diverge
    assert not np.allclose(lp0[:, 2:], lp1[:, 2:], atol=1e-5)
