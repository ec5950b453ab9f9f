"""Referring-expression encoder: Embedding -> dropout -> Linear+ReLU ->
bi-LSTM, variable lengths via masked `lax.scan` (TPU-native replacement for
the reference's sort/pack/unsort dance, `lib/layers/lang_encoder.py:11-82`).

Gate parametrization matches torch LSTM (i, f, g, o chunks of one fused
matmul) so torch checkpoints convert weight-for-weight. Padding token is 0;
lengths are derived as (labels != 0).sum(1) exactly like the reference.

Returns (output, hidden, embedded):
  output  : (B, T, 2H) per-step states, zero at padded steps
  hidden  : (B, 2H) final forward state ++ final backward state
  embedded: (B, T, word_vec_size) post-MLP embeddings
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class LSTMScan(nn.Module):
    """Single-direction LSTM over (B, T, D) with per-row valid lengths.

    The carry only updates while t < length, so the final carry equals the
    state at the last valid token (pack_padded_sequence semantics). Step
    outputs at padded positions are zero."""
    hidden_size: int

    @nn.compact
    def __call__(self, xs, lengths):
        b, t, d = xs.shape
        h = self.hidden_size
        # torch parametrization: gates = x W_ih^T + b_ih + h W_hh^T + b_hh
        w_ih = self.param("w_ih", nn.initializers.uniform(scale=1.0 / h ** 0.5),
                          (d, 4 * h))
        w_hh = self.param("w_hh", nn.initializers.uniform(scale=1.0 / h ** 0.5),
                          (h, 4 * h))
        b_ih = self.param("bias_ih", nn.initializers.zeros, (4 * h,))
        b_hh = self.param("bias_hh", nn.initializers.zeros, (4 * h,))

        def step(carry, inp):
            hc, cc = carry
            x_t, valid = inp            # (B, D), (B,)
            gates = x_t @ w_ih + b_ih + hc @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            v = valid[:, None]
            hc = jnp.where(v, h_new, hc)
            cc = jnp.where(v, c_new, cc)
            out = jnp.where(v, h_new, jnp.zeros_like(h_new))
            return (hc, cc), out

        valid = jnp.arange(t)[None, :] < lengths[:, None]       # (B, T)
        init = (jnp.zeros((b, h), xs.dtype), jnp.zeros((b, h), xs.dtype))
        (h_fin, _), outs = jax.lax.scan(
            step, init,
            (xs.transpose(1, 0, 2), valid.T))
        return outs.transpose(1, 0, 2), h_fin                   # (B,T,H), (B,H)


class _LSTMParams(nn.Module):
    """Param holder with LSTMScan's exact tree (w_ih/w_hh/bias_ih/bias_hh)
    so the fused bidirectional scan keeps checkpoint-identical paths
    (lstm_fwd/*, lstm_bwd/*)."""
    in_dim: int
    hidden_size: int

    @nn.compact
    def __call__(self):
        h = self.hidden_size
        u = nn.initializers.uniform(scale=1.0 / h ** 0.5)
        return (self.param("w_ih", u, (self.in_dim, 4 * h)),
                self.param("w_hh", u, (h, 4 * h)),
                self.param("bias_ih", nn.initializers.zeros, (4 * h,)),
                self.param("bias_hh", nn.initializers.zeros, (4 * h,)))


class RNNEncoder(nn.Module):
    vocab_size: int
    word_embedding_size: int = 512
    word_vec_size: int = 512
    hidden_size: int = 512
    bidirectional: bool = True
    input_dropout_p: float = 0.5
    # run both directions in ONE lax.scan as a stacked batched matmul:
    # the two sequential T-step chains become one (latency, not FLOPs, is
    # what a 10-step LSTM on 8 expressions costs on the MXU)
    fused_bidir: bool = True

    @nn.compact
    def __call__(self, labels, *, train: bool = False):
        """labels: (B, T) int32, 0 = PAD."""
        lengths = jnp.sum(labels != 0, axis=1)                  # (B,)
        emb_table = nn.Embed(self.vocab_size, self.word_embedding_size,
                             name="embedding")
        embedded = emb_table(labels)
        embedded = nn.Dropout(self.input_dropout_p, deterministic=not train,
                              name="input_dropout")(embedded)
        embedded = nn.relu(nn.Dense(self.word_vec_size, name="mlp")(embedded))

        if not self.bidirectional:
            out_f, h_f = LSTMScan(self.hidden_size, name="lstm_fwd")(
                embedded, lengths)
            return out_f, h_f, embedded

        # backward direction input: per-row reverse over the valid prefix
        b, t, _ = embedded.shape
        pos = jnp.arange(t)[None, :]
        rev_idx = jnp.clip(lengths[:, None] - 1 - pos, 0, t - 1)  # (B, T)
        xs_rev = jnp.take_along_axis(embedded, rev_idx[:, :, None], axis=1)

        if not self.fused_bidir:
            out_f, h_f = LSTMScan(self.hidden_size, name="lstm_fwd")(
                embedded, lengths)
            out_r, h_b = LSTMScan(self.hidden_size, name="lstm_bwd")(
                xs_rev, lengths)
        else:
            h = self.hidden_size
            pf = _LSTMParams(embedded.shape[-1], h, name="lstm_fwd")()
            pb = _LSTMParams(embedded.shape[-1], h, name="lstm_bwd")()
            w_ih, w_hh, b_ih, b_hh = (jnp.stack(ps)
                                      for ps in zip(pf, pb))  # (2, ...)

            def step(carry, inp):
                hc, cc = carry                       # (2, B, H)
                x_t, valid = inp                     # (2, B, D), (B,)
                gates = (jnp.einsum("nbd,ndh->nbh", x_t, w_ih)
                         + jnp.einsum("nbh,nhg->nbg", hc, w_hh)
                         + b_ih[:, None, :] + b_hh[:, None, :])
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c_new = jax.nn.sigmoid(f) * cc + \
                    jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                v = valid[None, :, None]
                hc = jnp.where(v, h_new, hc)
                cc = jnp.where(v, c_new, cc)
                out = jnp.where(v, h_new, jnp.zeros_like(h_new))
                return (hc, cc), out

            xs2 = jnp.stack([embedded, xs_rev]).transpose(2, 0, 1, 3)
            valid = (jnp.arange(t)[None, :] < lengths[:, None]).T  # (T, B)
            init = (jnp.zeros((2, b, h), embedded.dtype),
                    jnp.zeros((2, b, h), embedded.dtype))
            (h_fin, _), outs = jax.lax.scan(step, init, (xs2, valid))
            out_f = outs[:, 0].transpose(1, 0, 2)               # (B, T, H)
            out_r = outs[:, 1].transpose(1, 0, 2)
            h_f, h_b = h_fin[0], h_fin[1]

        # scatter back: out_b[i] = out_r[len-1-i] for i < len, else 0
        out_b = jnp.take_along_axis(out_r, rev_idx[:, :, None], axis=1)
        out_b = jnp.where(pos[:, :, None] < lengths[:, None, None], out_b, 0.0)

        output = jnp.concatenate([out_f, out_b], axis=-1)       # (B, T, 2H)
        hidden = jnp.concatenate([h_f, h_b], axis=-1)           # (B, 2H)
        return output, hidden, embedded
