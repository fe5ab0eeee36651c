"""Tests for encoder/decoder/latent DiT components.

The reference has no tests (SURVEY.md §4); these encode the structural
invariants its design relies on: mask invariance of the encoder (padding
entities must not change the latents), entity-query decoding shapes, RoPE
rotation identities, zero-init identity behavior of the DiT, and
share_weights parameter tying.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.models import (
    Decoder,
    Decoder2,
    DecoderFE,
    DecoderQuerySplitter,
    Encoder,
    Encoder2,
    LatentDiT,
)
from lam_slide_tpu.models.latent_dit import apply_rope, rope_cos_sin
from lam_slide_tpu.nn.embeddings import EntityEmbedding


B, N, F, E, L, DL = 2, 7, 12, 16, 4, 8


def _entity_emb(key, b=B, n=N):
    ids = jax.random.randint(key, (b, n), 0, 32)
    mod = EntityEmbedding(n_entities=32, embedding_dim=E)
    vs = mod.init(key, ids)
    return mod.apply(vs, ids)


class TestEncoder:
    def _make(self, cls=Encoder, **kw):
        defaults = dict(
            dim_latent=DL, num_latents=L, dim_head_cross=4, dim_head_latent=4,
            num_head_cross=2, num_head_latent=2, qk_norm=True,
        )
        defaults.update(kw)
        return cls(**defaults)

    def test_shapes(self):
        key = jax.random.PRNGKey(0)
        enc = self._make()
        x = jax.random.normal(key, (B, N, F))
        emb = _entity_emb(key)
        vs = enc.init(key, x, emb)
        out = enc.apply(vs, x, emb)
        assert out.shape == (B, L, DL)

    def test_mask_invariance(self):
        """Masked-out (padding) entities must not influence the latents."""
        key = jax.random.PRNGKey(1)
        enc = self._make()
        x = jax.random.normal(key, (B, N, F))
        emb = _entity_emb(key)
        mask = jnp.ones((B, N), dtype=bool).at[:, -2:].set(False)
        vs = enc.init(key, x, emb)
        out1 = enc.apply(vs, x, emb, mask=mask)
        # scramble the masked entities' features — output must be identical
        x2 = x.at[:, -2:].set(123.0)
        out2 = enc.apply(vs, x2, emb, mask=mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_encoder2_interleaved(self):
        key = jax.random.PRNGKey(2)
        enc = self._make(cls=Encoder2, num_block=2)
        x = jax.random.normal(key, (B, N, F))
        emb = _entity_emb(key)
        vs = enc.init(key, x, emb)
        assert enc.apply(vs, x, emb).shape == (B, L, DL)


class TestDecoder:
    outputs = {"pos": 3, "atom": 5}

    def _run(self, cls, **kw):
        key = jax.random.PRNGKey(3)
        dec = cls(
            outputs=self.outputs, dim_query=E, dim_head_cross=4, dim_head_latent=4,
            num_head_cross=2, num_head_latent=2, num_block_cross=1, num_block_attn=1,
            dropout_query=0.0, **kw,
        )
        latent = jax.random.normal(key, (B, L, DL))
        emb = _entity_emb(key)
        vs = dec.init(key, latent, emb)
        return dec.apply(vs, latent, emb)

    def test_decoder_heads(self):
        out = self._run(Decoder)
        assert out["pos"].shape == (B, N, 3)
        assert out["atom"].shape == (B, N, 5)

    def test_decoder_fe_energy(self):
        out = self._run(DecoderFE)
        assert out["energy"].shape == (B, 1)

    def test_decoder2(self):
        out = self._run(Decoder2)
        assert out["pos"].shape == (B, N, 3)

    def test_query_splitter(self):
        out = self._run(DecoderQuerySplitter, num_split=3)
        assert out["pos"].shape == (B, N, 3)


class TestRoPE:
    def test_zero_position_identity(self):
        cos, sin = rope_cos_sin(4, 8)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 8))
        out = apply_rope(x, cos[:1], sin[:1])  # position 0: angle 0 → identity
        np.testing.assert_allclose(np.asarray(out[..., :1, :]), np.asarray(x[..., :1, :]), atol=1e-6)

    def test_norm_preserved(self):
        cos, sin = rope_cos_sin(16, 8)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 8))
        out = apply_rope(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )

    def test_relative_shift(self):
        """RoPE dot products depend only on relative position."""
        cos, sin = rope_cos_sin(8, 8)
        q = jax.random.normal(jax.random.PRNGKey(2), (8,))
        k = jax.random.normal(jax.random.PRNGKey(3), (8,))

        def rotated_dot(i, j):
            qi = apply_rope(q[None], cos[i : i + 1], sin[i : i + 1])[0]
            kj = apply_rope(k[None], cos[j : j + 1], sin[j : j + 1])[0]
            return float(jnp.dot(qi, kj))

        assert rotated_dot(2, 3) == pytest.approx(rotated_dot(4, 5), abs=1e-5)
        assert rotated_dot(0, 3) == pytest.approx(rotated_dot(2, 5), abs=1e-5)


class TestLatentDiT:
    T, LT, DIN = 5, 3, 6

    def _make(self, **kw):
        defaults = dict(depth=2, in_dim=self.DIN, hidden_size=32, num_heads=4, mlp_ratio=2)
        defaults.update(kw)
        return LatentDiT(**defaults)

    def _inputs(self, key):
        x = jax.random.normal(key, (B, self.T, self.LT, self.DIN))
        t = jax.random.uniform(key, (B,))
        x_cond = jnp.zeros_like(x)
        mask = jnp.zeros((B, self.T, self.LT), dtype=jnp.int32).at[:, :2].set(1)
        return x, t, x_cond, mask

    def test_head_split_same_param_count(self):
        """The head-split A/B knob (PERF.md dh lane tax) only reshapes the
        attention view: every split of the same hidden width has an
        IDENTICAL parameter tree (shape-for-shape), so throughput A/Bs
        compare equal-capacity models."""
        key = jax.random.PRNGKey(0)
        x, t, x_cond, mask = self._inputs(key)
        trees, counts = {}, {}
        for h in (2, 4, 8):
            v = self._make(num_heads=h).init(key, x, t, x_cond, mask)
            flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
            counts[h] = sum(a.size for _, a in flat)
            # every tensor except the per-head-dim QKNorm scales is
            # shape-identical across splits
            trees[h] = {jax.tree_util.keystr(p): a.shape for p, a in flat
                        if "norm_scale" not in jax.tree_util.keystr(p)}
        assert trees[2] == trees[4] == trees[8]
        # the norm scales differ by O(dh) params — <0.5% of the model
        assert max(counts.values()) - min(counts.values()) < 0.005 * counts[4]

    def test_output_shape_and_zero_init(self):
        key = jax.random.PRNGKey(4)
        model = self._make()
        x, t, x_cond, mask = self._inputs(key)
        vs = model.init(key, x, t, x_cond, mask)
        out = model.apply(vs, x, t, x_cond, mask)
        assert out.shape == x.shape
        # zero-init output head → exactly zero at init (reference latent_si_v31.py:153-155)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_class_conditioning(self):
        key = jax.random.PRNGKey(5)
        model = self._make(vec_in_dim=4)
        x, t, x_cond, mask = self._inputs(key)
        y = jax.nn.one_hot(jnp.array([0, 2]), 4)
        vs = model.init(key, x, t, x_cond, mask, y)
        out = model.apply(vs, x, t, x_cond, mask, y)
        assert out.shape == x.shape

    def test_share_weights_param_count(self):
        key = jax.random.PRNGKey(6)
        x, t, x_cond, mask = self._inputs(key)
        n_params = lambda m: sum(
            a.size for a in jax.tree.leaves(m.init(key, x, t, x_cond, mask)["params"])
        )
        shared = n_params(self._make(depth=3, share_weights=True))
        unshared = n_params(self._make(depth=3, share_weights=False))
        assert shared < unshared

    def test_grad_flows(self):
        key = jax.random.PRNGKey(7)
        model = self._make(reference_init=False)
        x, t, x_cond, mask = self._inputs(key)
        vs = model.init(key, x, t, x_cond, mask)

        def loss(params):
            out = model.apply({"params": params}, x, t, x_cond, mask)
            return jnp.mean(out**2)

        g = jax.grad(loss)(vs["params"])
        norms = [float(jnp.linalg.norm(a)) for a in jax.tree.leaves(g)]
        assert any(n > 0 for n in norms)
        assert all(np.isfinite(n) for n in norms)

    def test_checkpointing_same_output(self):
        key = jax.random.PRNGKey(8)
        x, t, x_cond, mask = self._inputs(key)
        m1 = self._make(reference_init=False)
        m2 = self._make(reference_init=False, checkpointing=True)
        vs = m1.init(key, x, t, x_cond, mask)
        o1 = m1.apply(vs, x, t, x_cond, mask)
        o2 = m2.apply(vs, x, t, x_cond, mask)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_modulation_triple_and_dropout_seq():
    import jax
    import jax.numpy as jnp

    from lam_slide_tpu.models.latent_dit import ModulationTriple
    from lam_slide_tpu.nn.blocks import dropout_seq

    mod = ModulationTriple(dim=8, zero_init=True)
    vec = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    vs = mod.init(jax.random.PRNGKey(1), vec)
    m1, m2, m3 = mod.apply(vs, vec)
    assert m1.shift.shape == (2, 1, 1, 8)
    np.testing.assert_allclose(np.asarray(m3.gate), 0.0)  # zero-init identity

    x = jax.random.normal(jax.random.PRNGKey(2), (3, 10, 4))
    mask = jnp.ones((3, 10), bool).at[:, 8:].set(False)
    xd, md = dropout_seq(jax.random.PRNGKey(3), x, mask, dropout=0.5)
    assert xd.shape == (3, 5, 4)
    assert md.all()  # padding dropped first → all kept items are real


class TestScanLayers:
    """scan_layers=True rolls the depth loop into nn.scan — bit-equal to the
    unrolled loop under stack_layer_params, with working grads and remat."""

    def _world(self, **kw):
        import jax
        import jax.numpy as jnp

        from lam_slide_tpu.models import LatentDiT

        B, T, L, DIN = 2, 12, 2, 8
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, T, L, DIN))
        x_cond = jnp.zeros_like(x)
        mask = jnp.zeros((B, T, L), jnp.int32).at[:, :1].set(1)
        t = jnp.full((B,), 0.3)
        model = LatentDiT(depth=3, in_dim=DIN, hidden_size=32, num_heads=4,
                          n_timesteps=T, **kw)
        return model, (x, t, x_cond, mask)

    def test_matches_unrolled(self):
        import jax
        import jax.numpy as jnp

        from lam_slide_tpu.models.latent_dit import (stack_layer_params,
                                                     unstack_layer_params)

        base, args = self._world()
        v0 = base.init(jax.random.PRNGKey(0), *args)
        out0 = base.apply(v0, *args)
        scan, _ = self._world(scan_layers=True)
        stacked = {"params": stack_layer_params(v0["params"], 3)}
        assert (jax.tree.structure(stacked["params"])
                == jax.tree.structure(scan.init(jax.random.PRNGKey(1), *args)["params"]))
        out1 = scan.apply(stacked, *args)
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
        # unstack roundtrip
        back = unstack_layer_params(stacked["params"], 3)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: jnp.array_equal(a, b), back, v0["params"]))

    def test_bf16_scan_traces(self):
        """Production stage-2 configs run scan_layers=True with bf16; the
        scan carry (residual + gate) must be initialized in the layer's
        dtype or nn.scan rejects the carry-in/carry-out dtype mismatch."""
        import jax
        import jax.numpy as jnp

        model, args = self._world(scan_layers=True, dtype=jnp.bfloat16)
        v = model.init(jax.random.PRNGKey(0), *args)
        out = model.apply(v, *args)
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_remat_scan_equal_and_grads_flow(self):
        import jax
        import jax.numpy as jnp

        scan, args = self._world(scan_layers=True, reference_init=False)
        v = scan.init(jax.random.PRNGKey(0), *args)
        out = scan.apply(v, *args)
        remat, _ = self._world(scan_layers=True, reference_init=False,
                               checkpointing=True)
        out_r = remat.apply(v, *args)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_r))
        g = jax.grad(lambda p: float(0) + jnp.sum(
            scan.apply({"params": p}, *args) ** 2))(v["params"])
        leaf_sum = jax.tree_util.tree_reduce(
            lambda a, l: a + float(jnp.sum(jnp.abs(l))), g, 0.0)
        assert leaf_sum > 0
