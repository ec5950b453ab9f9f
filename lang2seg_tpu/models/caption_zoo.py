"""Caption decoder zoo + factory.

Capability parity with `lib/caption_models/__init__.py:16-52` (setup by
name) and the alternative decoders selectable via --caption_model
(`ShowTellModel.py`, `FCModel.py`, `Att2inModel.py`, `OldModel.py`,
`AttModel.py:468-490`). The flagship decoder is Att2In2Captioner
(captioner.py); this module adds the non-attention decoders as fused
lax.scan models sharing the same teacher_forced_nll / sample interface.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from lang2seg_tpu.config import ModelConfig
from lang2seg_tpu.models.captioner import Att2In2Captioner

_dense_init = nn.initializers.lecun_normal()


class _LSTMDecoderBase(nn.Module):
    """Shared raw-param LSTM decoder machinery (scan-safe)."""
    vocab_size: int
    seq_length: int = 10
    rnn_size: int = 512
    input_encoding_size: int = 512
    fc_feat_size: int = 4096
    drop_prob_lm: float = 0.5

    def _mk_params(self):
        v1 = self.vocab_size + 1
        r, e = self.rnn_size, self.input_encoding_size
        p = self.param
        self.embed_w = p("embed_w", nn.initializers.normal(0.01), (v1, e))
        self.logit_w = p("logit_w", _dense_init, (r, v1))
        self.logit_b = p("logit_b", nn.initializers.zeros, (v1,))
        self.i2h_w = p("i2h_w", _dense_init, (e, 4 * r))
        self.i2h_b = p("i2h_b", nn.initializers.zeros, (4 * r,))
        self.h2h_w = p("h2h_w", _dense_init, (r, 4 * r))
        self.h2h_b = p("h2h_b", nn.initializers.zeros, (4 * r,))

    def _lstm(self, xt, h, c):
        r = self.rnn_size
        s = xt @ self.i2h_w + self.i2h_b + h @ self.h2h_w + self.h2h_b
        i = jax.nn.sigmoid(s[:, :r])
        f = jax.nn.sigmoid(s[:, r:2 * r])
        o = jax.nn.sigmoid(s[:, 2 * r:3 * r])
        g = jnp.tanh(s[:, 3 * r:])
        c2 = f * c + i * g
        h2 = o * jnp.tanh(c2)
        return h2, c2

    def _drop(self, x, key):
        if key is None or self.drop_prob_lm <= 0:
            return x
        keep = jax.random.bernoulli(key, 1.0 - self.drop_prob_lm, x.shape)
        return jnp.where(keep, x / (1.0 - self.drop_prob_lm), 0.0)

    def _run(self, img_emb, seq, train):
        """Feed img embedding at t=-1, then words. Returns (B, T-1, V+1)
        log-probs (ShowTell/FC structure)."""
        b, t = seq.shape
        rng = self.make_rng("dropout") if train else jax.random.PRNGKey(0)
        h = jnp.zeros((b, self.rnn_size), img_emb.dtype)
        c = jnp.zeros_like(h)
        # image step
        h, c = self._lstm(img_emb, h, c)

        def step(carry, it):
            h, c, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            xt = self._drop(nn.relu(self.embed_w[it]),
                            k1 if train else None)
            h, c = self._lstm(xt, h, c)
            out = self._drop(h, k2 if train else None)
            logp = jax.nn.log_softmax(out @ self.logit_w + self.logit_b,
                                      axis=-1)
            return (h, c, key), logp

        _, logps = jax.lax.scan(step, (h, c, rng), seq[:, :-1].T)
        return logps.transpose(1, 0, 2)

    def teacher_forced_nll(self, fc_feats, att_feats, seq, mask,
                           train: bool = True):
        logps = self.teacher_forced_logprobs(fc_feats, att_feats, seq,
                                             train)
        target = seq[:, 1:]
        m = mask[:, 1:1 + logps.shape[1]].astype(logps.dtype)
        nll = -jnp.take_along_axis(logps, target[..., None],
                                   axis=-1)[..., 0]
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


class ShowTellCaptioner(_LSTMDecoderBase):
    """ShowTellModel.py: img_embed(fc) as step -1, plain LSTM decoder."""

    def setup(self):
        self._mk_params()
        self.img_embed = nn.Dense(self.input_encoding_size,
                                  name="img_embed")

    def teacher_forced_logprobs(self, fc_feats, att_feats, seq,
                                train: bool = True):
        del att_feats
        return self._run(self.img_embed(fc_feats), seq, train)


class FCCaptioner(_LSTMDecoderBase):
    """FCModel.py: fc feature through an embed layer, LSTM core with
    dropout on outputs."""

    def setup(self):
        self._mk_params()
        self.fc_embed = nn.Dense(self.input_encoding_size, name="fc_embed")

    def teacher_forced_logprobs(self, fc_feats, att_feats, seq,
                                train: bool = True):
        del att_feats
        img = nn.relu(self.fc_embed(fc_feats))
        return self._run(img, seq, train)


class TopDownCaptioner(nn.Module):
    """Bottom-up/top-down decoder (reference TopDownCore,
    AttModel.py:380-395): att-LSTM over [h_lang, fc_emb, word_emb],
    additive attention with h_att, lang-LSTM over [att_res, h_att]."""
    vocab_size: int
    seq_length: int = 10
    rnn_size: int = 512
    input_encoding_size: int = 512
    att_hid_size: int = 512
    fc_feat_size: int = 4096
    att_feat_size: int = 4096
    drop_prob_lm: float = 0.5

    def setup(self):
        v1 = self.vocab_size + 1
        r, e, ah = self.rnn_size, self.input_encoding_size, self.att_hid_size
        p = self.param
        init = _dense_init
        self.embed_w = p("embed_w", nn.initializers.normal(0.01), (v1, e))
        self.logit_w = p("logit_w", init, (r, v1))
        self.logit_b = p("logit_b", nn.initializers.zeros, (v1,))
        # att lstm: input = [h_lang, fc, xt] -> gates
        self.att_ih = p("att_ih", init, (r + r + e, 4 * r))
        self.att_hh = p("att_hh", init, (r, 4 * r))
        self.att_b = p("att_b", nn.initializers.zeros, (4 * r,))
        # lang lstm: input = [att_res, h_att]
        self.lang_ih = p("lang_ih", init, (r + r, 4 * r))
        self.lang_hh = p("lang_hh", init, (r, 4 * r))
        self.lang_b = p("lang_b", nn.initializers.zeros, (4 * r,))
        # attention
        self.h2att_w = p("h2att_w", init, (r, ah))
        self.h2att_b = p("h2att_b", nn.initializers.zeros, (ah,))
        self.alpha_w = p("alpha_w", init, (ah, 1))
        self.fc_embed = nn.Dense(r, name="fc_embed")
        self.att_embed = nn.Dense(r, name="att_embed")
        self.ctx2att = nn.Dense(ah, name="ctx2att")

    @staticmethod
    def _lstm_cell(x, h, c, w_ih, w_hh, b):
        r = h.shape[-1]
        s = x @ w_ih + h @ w_hh + b
        i = jax.nn.sigmoid(s[:, :r])
        f = jax.nn.sigmoid(s[:, r:2 * r])
        o = jax.nn.sigmoid(s[:, 2 * r:3 * r])
        g = jnp.tanh(s[:, 3 * r:])
        c2 = f * c + i * g
        return o * jnp.tanh(c2), c2

    def teacher_forced_logprobs(self, fc_feats, att_feats, seq,
                                train: bool = True):
        b, t = seq.shape
        fc = nn.relu(self.fc_embed(fc_feats))
        att = nn.relu(self.att_embed(att_feats))
        p_att = self.ctx2att(att)
        z = jnp.zeros((b, self.rnn_size), fc.dtype)

        def step(carry, it):
            h_a, c_a, h_l, c_l = carry
            xt = nn.relu(self.embed_w[it])
            h_a, c_a = self._lstm_cell(
                jnp.concatenate([h_l, fc, xt], -1), h_a, c_a,
                self.att_ih, self.att_hh, self.att_b)
            q = (h_a @ self.h2att_w + self.h2att_b)[:, None, :]
            e = (jnp.tanh(p_att + q) @ self.alpha_w)[..., 0]
            w = jax.nn.softmax(e, axis=-1)
            att_res = jnp.einsum("bl,bld->bd", w, att)
            h_l, c_l = self._lstm_cell(
                jnp.concatenate([att_res, h_a], -1), h_l, c_l,
                self.lang_ih, self.lang_hh, self.lang_b)
            logp = jax.nn.log_softmax(h_l @ self.logit_w + self.logit_b,
                                      axis=-1)
            return (h_a, c_a, h_l, c_l), logp

        _, logps = jax.lax.scan(step, (z, z, z, z), seq[:, :-1].T)
        return logps.transpose(1, 0, 2)

    teacher_forced_nll = _LSTMDecoderBase.teacher_forced_nll


class ShowAttendTellCaptioner(nn.Module):
    """Show-attend-tell / all_img family (reference OldModel.py): single
    LSTM whose input concatenates the word embedding with an attention
    context computed from the previous hidden state."""
    vocab_size: int
    seq_length: int = 10
    rnn_size: int = 512
    input_encoding_size: int = 512
    att_hid_size: int = 512
    fc_feat_size: int = 4096
    att_feat_size: int = 4096
    drop_prob_lm: float = 0.5

    def setup(self):
        v1 = self.vocab_size + 1
        r, e, ah = self.rnn_size, self.input_encoding_size, self.att_hid_size
        p, init = self.param, _dense_init
        self.embed_w = p("embed_w", nn.initializers.normal(0.01), (v1, e))
        self.logit_w = p("logit_w", init, (r, v1))
        self.logit_b = p("logit_b", nn.initializers.zeros, (v1,))
        self.ih = p("ih", init, (e + r, 4 * r))
        self.hh = p("hh", init, (r, 4 * r))
        self.b = p("b", nn.initializers.zeros, (4 * r,))
        self.h2att_w = p("h2att_w", init, (r, ah))
        self.alpha_w = p("alpha_w", init, (ah, 1))
        self.att_embed = nn.Dense(r, name="att_embed")
        self.ctx2att = nn.Dense(ah, name="ctx2att")

    def teacher_forced_logprobs(self, fc_feats, att_feats, seq,
                                train: bool = True):
        del fc_feats
        b, t = seq.shape
        att = nn.relu(self.att_embed(att_feats))
        p_att = self.ctx2att(att)
        z = jnp.zeros((b, self.rnn_size), att.dtype)

        def step(carry, it):
            h, c = carry
            q = (h @ self.h2att_w)[:, None, :]
            e = (jnp.tanh(p_att + q) @ self.alpha_w)[..., 0]
            ctx = jnp.einsum("bl,bld->bd", jax.nn.softmax(e, -1), att)
            xt = jnp.concatenate([nn.relu(self.embed_w[it]), ctx], -1)
            h, c = TopDownCaptioner._lstm_cell(xt, h, c, self.ih, self.hh,
                                               self.b)
            logp = jax.nn.log_softmax(h @ self.logit_w + self.logit_b, -1)
            return (h, c), logp

        _, logps = jax.lax.scan(step, (z, z), seq[:, :-1].T)
        return logps.transpose(1, 0, 2)

    teacher_forced_nll = _LSTMDecoderBase.teacher_forced_nll


class AdaAttCaptioner(nn.Module):
    """Adaptive attention with a visual sentinel (reference AdaAttModel /
    AdaAttMO, AttModel.py): the LSTM keeps a sentinel state s_t =
    sigmoid(W[x,h]) * tanh(c_t); attention runs over regions PLUS the
    sentinel, letting the decoder choose 'look' vs 'language'."""
    vocab_size: int
    seq_length: int = 10
    rnn_size: int = 512
    input_encoding_size: int = 512
    att_hid_size: int = 512
    fc_feat_size: int = 4096
    att_feat_size: int = 4096
    drop_prob_lm: float = 0.5

    def setup(self):
        v1 = self.vocab_size + 1
        r, e, ah = self.rnn_size, self.input_encoding_size, self.att_hid_size
        p, init = self.param, _dense_init
        self.embed_w = p("embed_w", nn.initializers.normal(0.01), (v1, e))
        self.logit_w = p("logit_w", init, (r, v1))
        self.logit_b = p("logit_b", nn.initializers.zeros, (v1,))
        self.ih = p("ih", init, (e + r, 4 * r))
        self.hh = p("hh", init, (r, 4 * r))
        self.b = p("b", nn.initializers.zeros, (4 * r,))
        # sentinel gate over [x, h]
        self.sent_x = p("sent_x", init, (e + r, r))
        self.sent_h = p("sent_h", init, (r, r))
        self.h2att_w = p("h2att_w", init, (r, ah))
        self.s2att_w = p("s2att_w", init, (r, ah))
        self.alpha_w = p("alpha_w", init, (ah, 1))
        self.fc_embed = nn.Dense(r, name="fc_embed")
        self.att_embed = nn.Dense(r, name="att_embed")
        self.ctx2att = nn.Dense(ah, name="ctx2att")

    def teacher_forced_logprobs(self, fc_feats, att_feats, seq,
                                train: bool = True):
        b, t = seq.shape
        fc = nn.relu(self.fc_embed(fc_feats))
        att = nn.relu(self.att_embed(att_feats))
        p_att = self.ctx2att(att)
        z = jnp.zeros((b, self.rnn_size), att.dtype)

        def step(carry, it):
            h_prev, c_prev = carry
            xt = jnp.concatenate([nn.relu(self.embed_w[it]), fc], -1)
            h, c = TopDownCaptioner._lstm_cell(xt, h_prev, c_prev,
                                               self.ih, self.hh, self.b)
            gate = jax.nn.sigmoid(xt @ self.sent_x + h_prev @ self.sent_h)
            s = gate * jnp.tanh(c)                       # sentinel
            q = (h @ self.h2att_w)[:, None, :]
            e_r = (jnp.tanh(p_att + q) @ self.alpha_w)[..., 0]   # (B, L)
            e_s = (jnp.tanh(s @ self.s2att_w + h @ self.h2att_w)
                   @ self.alpha_w)                               # (B, 1)
            logits = jnp.concatenate([e_r, e_s], axis=-1)
            w = jax.nn.softmax(logits, axis=-1)
            ctx = jnp.einsum("bl,bld->bd", w[:, :-1], att) \
                + w[:, -1:] * s
            out = h + ctx
            logp = jax.nn.log_softmax(out @ self.logit_w + self.logit_b,
                                      -1)
            return (h, c), logp

        _, logps = jax.lax.scan(step, (z, z), seq[:, :-1].T)
        return logps.transpose(1, 0, 2)

    teacher_forced_nll = _LSTMDecoderBase.teacher_forced_nll


def setup_captioner(m: ModelConfig):
    """Factory (caption_models/__init__.py:16-52): decoder by name."""
    name = m.caption_model
    if name in ("att2in2", "att2in"):
        return Att2In2Captioner(
            vocab_size=m.cap_vocab_size, seq_length=m.cap_seq_length,
            rnn_size=m.cap_rnn_size,
            input_encoding_size=m.cap_input_encoding_size,
            att_hid_size=m.cap_att_hid_size,
            fc_feat_size=m.cap_fc_feat_size,
            att_feat_size=m.cap_att_feat_size,
            drop_prob_lm=m.cap_drop_prob_lm,
            ss_prob=m.cap_scheduled_sampling_prob)
    common = dict(vocab_size=m.cap_vocab_size, seq_length=m.cap_seq_length,
                  rnn_size=m.cap_rnn_size,
                  input_encoding_size=m.cap_input_encoding_size,
                  fc_feat_size=m.cap_fc_feat_size,
                  drop_prob_lm=m.cap_drop_prob_lm)
    if name == "show_tell":
        return ShowTellCaptioner(**common)
    if name == "fc":
        return FCCaptioner(**common)
    att_common = dict(
        vocab_size=m.cap_vocab_size, seq_length=m.cap_seq_length,
        rnn_size=m.cap_rnn_size,
        input_encoding_size=m.cap_input_encoding_size,
        att_hid_size=m.cap_att_hid_size,
        fc_feat_size=m.cap_fc_feat_size,
        att_feat_size=m.cap_att_feat_size,
        drop_prob_lm=m.cap_drop_prob_lm)
    if name == "topdown":
        return TopDownCaptioner(**att_common)
    if name in ("show_attend_tell", "all_img"):
        return ShowAttendTellCaptioner(**att_common)
    if name in ("adaatt", "adaattmo"):
        return AdaAttCaptioner(**att_common)
    raise ValueError(f"unknown caption model {name}")
