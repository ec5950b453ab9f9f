"""MAttNet-legacy components carried by the reference tree.

The reference vendors several modules from MAttNet that its active
training paths do not exercise (marked dead in SURVEY §2: PhraseAttention
`lib/layers/lang_encoder.py:85-114`, MaxMarginCriterion
`lib/crits/max_margin_crit.py:9-51`, VisualEncoder/JointMatching
`lib/layers/visual_encoder.py:36`, `lib/layers/joint_match.py:115`).
They document intended capability (phrase-attended matching of regions to
expressions with a paired/unpaired ranking loss), so we provide working
TPU-native equivalents.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class PhraseAttention(nn.Module):
    """Word-attention pooling over encoder states
    (lang_encoder.py:85-114): scores = fc(context); softmax masked to
    non-pad tokens, renormalized; weighted sum of embeddings."""

    @nn.compact
    def __call__(self, context: jnp.ndarray, embedded: jnp.ndarray,
                 labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """context (B, T, D); embedded (B, T, E); labels (B, T) int.
        Returns (attn (B, T), weighted_emb (B, E))."""
        scores = nn.Dense(1, name="fc")(context)[..., 0]       # (B, T)
        attn = jax.nn.softmax(scores, axis=-1)
        not_pad = (labels != 0).astype(attn.dtype)
        attn = attn * not_pad
        attn = attn / jnp.maximum(attn.sum(axis=1, keepdims=True), 1e-8)
        weighted = jnp.einsum("bt,bte->be", attn, embedded)
        return attn, weighted


def max_margin_loss(paired_scores: jnp.ndarray,
                    unpaired_vis: jnp.ndarray,
                    unpaired_lang: jnp.ndarray,
                    margin: float = 0.1,
                    vis_weight: float = 1.0,
                    lang_weight: float = 1.0) -> jnp.ndarray:
    """Paired/unpaired ranking loss (max_margin_crit.py:9-51):
    mean(relu(margin + unpaired - paired)) over both negative types."""
    vis = jnp.maximum(0.0, margin + unpaired_vis - paired_scores)
    lang = jnp.maximum(0.0, margin + unpaired_lang - paired_scores)
    return vis_weight * vis.mean() + lang_weight * lang.mean()


class VisualEncoder(nn.Module):
    """Region feature encoder for matching (visual_encoder.py:36):
    projects pooled region features + spatial location feats into the
    joint embedding space."""
    dim: int = 512

    @nn.compact
    def __call__(self, region_feats: jnp.ndarray,
                 loc_feats: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([region_feats, loc_feats], axis=-1)
        x = nn.relu(nn.Dense(self.dim, name="proj1")(x))
        return nn.Dense(self.dim, name="proj2")(x)


class JointMatching(nn.Module):
    """Cosine-style matching score between encoded regions and
    phrase-attended language (joint_match.py:115)."""
    dim: int = 512

    @nn.compact
    def __call__(self, visual_emb: jnp.ndarray,
                 lang_emb: jnp.ndarray) -> jnp.ndarray:
        v = nn.Dense(self.dim, name="vis_emb")(visual_emb)
        l = nn.Dense(self.dim, name="lang_emb")(lang_emb)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                            1e-8)
        l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True),
                            1e-8)
        return jnp.sum(v * l, axis=-1)
