"""Att2in2 captioner (the cycle-consistency decoder) as fused lax.scan.

Capability parity with the reference's caption decoder
(`lib/caption_models/AttModel.py:27-209` base + Att2in2Core :426-466 +
additive Attention :397-423 + LanguageModelCriterion
`lib/misc/utils.py:39-53`): word embed -> ReLU -> dropout; fc/att feature
embeds; attention projected once (ctx2att); per-step core with attention
injected into the input transform (a2c) and a maxout in_transform;
log-softmax logits over vocab+1.

The reference steps the core in a Python loop per timestep
(AttModel.py:75-101) — a launch-bound hot loop; here the whole
teacher-forced unroll is one `lax.scan` (weights held as raw params so the
scan body is pure jnp), greedy sampling is one `lax.scan` with argmax
feedback, and beam search (CaptionModel.py:23-124) runs on fixed-width
beams with lax primitives.

Scheduled sampling (AttModel.py:76-88): with prob ss_prob per example per
step (i >= 1), feed a sample from the previous step's distribution
instead of the ground-truth token.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

_dense_init = nn.initializers.lecun_normal()


class Att2In2Captioner(nn.Module):
    vocab_size: int                 # vocab WITHOUT the +1 (torch uses V+1)
    seq_length: int = 10
    rnn_size: int = 512
    input_encoding_size: int = 512
    att_hid_size: int = 512
    fc_feat_size: int = 4096
    att_feat_size: int = 4096
    drop_prob_lm: float = 0.5
    ss_prob: float = 0.0

    def setup(self):
        v1 = self.vocab_size + 1
        r, e, ah = self.rnn_size, self.input_encoding_size, self.att_hid_size
        # pre-scan feature embeds stay as submodules (called once per fwd)
        self.fc_embed = nn.Dense(r, name="fc_embed")
        self.att_embed = nn.Dense(r, name="att_embed")
        self.ctx2att = nn.Dense(ah, name="ctx2att")
        # everything used inside lax.scan bodies is a raw param so the
        # step function is pure jnp (linen submodules cannot be
        # first-bound inside a raw scan)
        p = self.param
        self.embed_w = p("embed_w", nn.initializers.normal(0.01), (v1, e))
        self.logit_w = p("logit_w", _dense_init, (r, v1))
        self.logit_b = p("logit_b", nn.initializers.zeros, (v1,))
        self.a2c_w = p("a2c_w", _dense_init, (r, 2 * r))
        self.a2c_b = p("a2c_b", nn.initializers.zeros, (2 * r,))
        self.i2h_w = p("i2h_w", _dense_init, (e, 5 * r))
        self.i2h_b = p("i2h_b", nn.initializers.zeros, (5 * r,))
        self.h2h_w = p("h2h_w", _dense_init, (r, 5 * r))
        self.h2h_b = p("h2h_b", nn.initializers.zeros, (5 * r,))
        self.h2att_w = p("h2att_w", _dense_init, (r, ah))
        self.h2att_b = p("h2att_b", nn.initializers.zeros, (ah,))
        self.alpha_w = p("alpha_w", _dense_init, (ah, 1))
        self.alpha_b = p("alpha_b", nn.initializers.zeros, (1,))

    # ---------- pure step pieces ----------

    def _dropout_with(self, x, key):
        if key is None or self.drop_prob_lm <= 0.0:
            return x
        keep = jax.random.bernoulli(key, 1.0 - self.drop_prob_lm, x.shape)
        return jnp.where(keep, x / (1.0 - self.drop_prob_lm), 0.0)

    def _prep_feats(self, fc_feats, att_feats, drop_key=None):
        k1 = k2 = None
        if drop_key is not None:
            k1, k2 = jax.random.split(drop_key)
        fc = self._dropout_with(nn.relu(self.fc_embed(fc_feats)), k1)
        att = self._dropout_with(nn.relu(self.att_embed(att_feats)), k2)
        p_att = self.ctx2att(att)
        return fc, att, p_att

    def _attend(self, h, att, p_att):
        """Additive attention: softmax(alpha(tanh(p_att + W h))) @ att."""
        q = (h @ self.h2att_w + self.h2att_b)[:, None, :]   # (B, 1, Ah)
        e = (jnp.tanh(p_att + q) @ self.alpha_w + self.alpha_b)[..., 0]
        w = jax.nn.softmax(e, axis=-1)
        return jnp.einsum("bl,bld->bd", w, att)

    def _core(self, xt, att, p_att, h, c, drop_key):
        r = self.rnn_size
        att_res = self._attend(h, att, p_att)
        s = xt @ self.i2h_w + self.i2h_b + h @ self.h2h_w + self.h2h_b
        gates = jax.nn.sigmoid(s[:, :3 * r])
        i_g, f_g, o_g = gates[:, :r], gates[:, r:2 * r], gates[:, 2 * r:]
        it = s[:, 3 * r:] + att_res @ self.a2c_w + self.a2c_b
        it = jnp.maximum(it[:, :r], it[:, r:])              # maxout
        c_new = f_g * c + i_g * it
        h_new = o_g * jnp.tanh(c_new)
        return self._dropout_with(h_new, drop_key), h_new, c_new

    def _embed_word(self, it, drop_key):
        return self._dropout_with(nn.relu(self.embed_w[it]), drop_key)

    def _logits(self, out):
        return out @ self.logit_w + self.logit_b

    # ---------- teacher forcing ----------

    def teacher_forced_logprobs(self, fc_feats, att_feats, seq,
                                train: bool = True, ss_prob=None):
        """seq: (B, T) with BOS=0 at column 0. Returns log-probs
        (B, T-1, V+1) for predicting seq[:, 1:].

        ss_prob: optional traced scalar overriding the static self.ss_prob
        — lets the annealing schedule (engine/train_captioner.py) change
        the probability at runtime without recompiling."""
        b, t = seq.shape
        rng = self.make_rng("dropout") if train else None
        feat_key = scan_key = None
        if rng is not None:
            feat_key, scan_key = jax.random.split(rng)
        else:
            scan_key = jax.random.PRNGKey(0)
        fc, att, p_att = self._prep_feats(fc_feats, att_feats, feat_key)
        h0 = jnp.zeros((b, self.rnn_size), fc.dtype)
        use_ss = train and (ss_prob is not None or self.ss_prob > 0.0)
        p_ss = self.ss_prob if ss_prob is None else ss_prob

        def step(carry, inp):
            h, c, prev_logp, key = carry
            it, step_i = inp
            key, k_ss, k_samp, k_e, k_c = jax.random.split(key, 5)
            if use_ss:
                use_sample = (jax.random.uniform(k_ss, (b,)) < p_ss) \
                    & (step_i >= 1)
                sampled = jax.random.categorical(k_samp, prev_logp, axis=-1)
                it = jnp.where(use_sample, sampled.astype(it.dtype), it)
            xt = self._embed_word(it, k_e if train else None)
            out, h, c = self._core(xt, att, p_att, h, c,
                                   k_c if train else None)
            logp = jax.nn.log_softmax(self._logits(out), axis=-1)
            return (h, c, logp, key), logp

        init_logp = jnp.zeros((b, self.vocab_size + 1), fc.dtype)
        xs = (seq[:, :-1].T, jnp.arange(t - 1))
        _, logps = jax.lax.scan(step, (h0, h0, init_logp, scan_key), xs)
        return logps.transpose(1, 0, 2)                # (B, T-1, V+1)

    def teacher_forced_nll(self, fc_feats, att_feats, seq, mask,
                           train: bool = True, ss_prob=None):
        """LanguageModelCriterion (misc/utils.py:39-53): masked mean NLL of
        seq[:, 1:] under the teacher-forced distribution."""
        logps = self.teacher_forced_logprobs(fc_feats, att_feats, seq, train,
                                             ss_prob=ss_prob)
        target = seq[:, 1:]
        m = mask[:, 1:1 + logps.shape[1]].astype(logps.dtype)
        nll = -jnp.take_along_axis(logps, target[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

    # ---------- sampling ----------

    def sample_greedy(self, fc_feats, att_feats):
        """Greedy decode (reference sample with sample_max=1,
        AttModel.py:160-209). Returns (seq (B, T), seq_logprobs (B, T))."""
        b = fc_feats.shape[0]
        fc, att, p_att = self._prep_feats(fc_feats, att_feats, None)
        h0 = jnp.zeros((b, self.rnn_size), fc.dtype)
        bos = jnp.zeros((b,), jnp.int32)

        def step(carry, _):
            h, c, it, done = carry
            xt = self._embed_word(it, None)
            out, h, c = self._core(xt, att, p_att, h, c, None)
            logp = jax.nn.log_softmax(self._logits(out), axis=-1)
            nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            lp = jnp.max(logp, axis=-1)
            nxt = jnp.where(done, 0, nxt)
            done = done | (nxt == 0)
            return (h, c, nxt, done), (nxt, lp)

        _, (seq, lps) = jax.lax.scan(
            step, (h0, h0, bos, jnp.zeros((b,), bool)), None,
            length=self.seq_length)
        return seq.T, lps.T

    def sample_beam(self, fc_feats, att_feats, beam_size: int = 10):
        """Fixed-width beam search (reference CaptionModel.beam_search,
        CaptionModel.py:23-124) with UNK (index V) suppression. Returns
        (best sequences (B, T), best scores (B,))."""
        b = fc_feats.shape[0]
        fc, att, p_att = self._prep_feats(fc_feats, att_feats, None)
        k = beam_size
        v1 = self.vocab_size + 1

        def one_image(att_i, p_att_i):
            att_b = jnp.broadcast_to(att_i[None], (k,) + att_i.shape)
            p_b = jnp.broadcast_to(p_att_i[None], (k,) + p_att_i.shape)
            h = jnp.zeros((k, self.rnn_size), fc.dtype)
            c = jnp.zeros_like(h)
            seqs = jnp.zeros((k, self.seq_length), jnp.int32)
            scores = jnp.full((k,), -1e9).at[0].set(0.0)
            done = jnp.zeros((k,), bool)
            it = jnp.zeros((k,), jnp.int32)

            def step(carry, step_i):
                h, c, it, seqs, scores, done = carry
                xt = self._embed_word(it, None)
                out, h2, c2 = self._core(xt, att_b, p_b, h, c, None)
                logp = jax.nn.log_softmax(self._logits(out), axis=-1)
                # suppress UNK (last index) like the reference (-1000 bias)
                logp = logp.at[:, v1 - 1].add(-1000.0)
                # finished beams only extend with PAD at zero cost
                pad_only = jnp.full_like(logp, -1e9).at[:, 0].set(0.0)
                logp = jnp.where(done[:, None], pad_only, logp)
                cand = scores[:, None] + logp            # (K, V1)
                top, idx = jax.lax.top_k(cand.reshape(-1), k)
                beam_idx = idx // v1
                word = (idx % v1).astype(jnp.int32)
                seqs = seqs[beam_idx].at[:, step_i].set(word)
                done = done[beam_idx] | (word == 0)
                return (h2[beam_idx], c2[beam_idx], word, seqs, top, done), \
                    None

            (h, c, it, seqs, scores, done), _ = jax.lax.scan(
                step, (h, c, it, seqs, scores, done),
                jnp.arange(self.seq_length))
            best = jnp.argmax(scores)
            return seqs[best], scores[best]

        return jax.vmap(one_image)(att, p_att)
