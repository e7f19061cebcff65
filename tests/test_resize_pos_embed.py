"""resize_pos_embed parity vs the reference (deit_vision_transformer.py:
449-468): bicubic grid resize with torch's exact interpolation semantics
(F.interpolate mode='bicubic', align_corners=False — cubic convolution
A=-0.75, half-pixel centers, border clamp, no antialias), cls/dist prefix
token slots carried over unscaled, and the non-224 import path end to end
(checkpoint_filter_fn semantics, deit_vision_transformer.py:471-487)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])

torch = pytest.importorskip("torch")

import reference_loader as rl
from ofq_tpu.convert import convert_deit, merge_pretrained
from ofq_tpu.convert.torch_import import (resize_pos_embed,
                                          torch_bicubic_resize)


def _ref_resize(posemb_np, new_len, num_tokens):
    """The reference's own resize_pos_embed on a torch tensor."""
    rl.install()
    from src.deit_vision_transformer import resize_pos_embed as ref_fn

    new = torch.zeros(1, new_len, posemb_np.shape[-1])
    return ref_fn(torch.from_numpy(posemb_np), new,
                  num_tokens=num_tokens).numpy()


class TestGoldenVsReference:
    @pytest.mark.parametrize("gs_old,gs_new", [(14, 15), (14, 24), (24, 14),
                                               (14, 7), (5, 13)])
    @pytest.mark.parametrize("num_tokens", [1, 2])
    def test_matches_reference_interpolation(self, gs_old, gs_new,
                                             num_tokens):
        rng = np.random.default_rng(gs_old * 100 + gs_new + num_tokens)
        pe = rng.normal(size=(1, num_tokens + gs_old * gs_old, 24)
                        ).astype(np.float32)
        want = _ref_resize(pe, num_tokens + gs_new * gs_new, num_tokens)
        got = resize_pos_embed(pe, num_tokens + gs_new * gs_new)
        # fp32 rounding only — a wrong kernel (bilinear, Keys a=-0.5,
        # antialiased) differs by >=1e-3 at these grids (see mutation test)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_prefix_tokens_bit_exact(self):
        """cls/dist slots must be carried over UNSCALED, in their slots."""
        rng = np.random.default_rng(3)
        pe = rng.normal(size=(1, 2 + 14 * 14, 16)).astype(np.float32)
        got = resize_pos_embed(pe, 2 + 10 * 10)
        np.testing.assert_array_equal(got[:, :2], pe[:, :2])
        assert got.shape == (1, 2 + 10 * 10, 16)

    def test_noop_when_grid_matches(self):
        rng = np.random.default_rng(4)
        pe = rng.normal(size=(1, 2 + 14 * 14, 16)).astype(np.float32)
        got = resize_pos_embed(pe, pe.shape[1])
        np.testing.assert_array_equal(got, pe)

    def test_wrong_interpolation_would_fail(self):
        """The tolerance above genuinely discriminates: torch-bilinear and
        jax-bicubic (Keys a=-0.5 + antialias) both differ from the
        reference's bicubic by far more than the 1e-5 gate."""
        import torch.nn.functional as F

        rng = np.random.default_rng(5)
        g = rng.normal(size=(14, 14, 8)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(g.transpose(2, 0, 1))[None],
                             size=(15, 15), mode="bicubic",
                             align_corners=False)[0].numpy().transpose(
                                 1, 2, 0)
        ours = torch_bicubic_resize(g, (15, 15)).astype(np.float32)
        np.testing.assert_allclose(ours, want, atol=1e-5, rtol=1e-5)
        bilinear = F.interpolate(
            torch.from_numpy(g.transpose(2, 0, 1))[None], size=(15, 15),
            mode="bilinear", align_corners=False)[0].numpy().transpose(
                1, 2, 0)
        assert np.abs(bilinear - want).max() > 1e-2
        import jax

        keys = np.asarray(jax.image.resize(g, (15, 15, 8),
                                           method="bicubic"))
        assert np.abs(keys - want).max() > 1e-3

    def test_infer_prefix_tokens(self):
        """When both (len-2) and (len-1)/(len) are square, the larger
        prefix wins (distilled first), matching the reference's explicit
        num_tokens for each model family."""
        from ofq_tpu.convert.torch_import import _infer_num_tokens

        assert _infer_num_tokens(2 + 14 * 14, 2 + 15 * 15) == 2
        assert _infer_num_tokens(1 + 14 * 14, 1 + 10 * 10) == 1
        with pytest.raises(ValueError):
            _infer_num_tokens(7, 12)


class TestNon224Import:
    """checkpoint_filter_fn semantics: a 224-trained checkpoint loaded
    into a different-img-size model resizes pos_embed through
    resize_pos_embed and everything else verbatim."""

    @staticmethod
    def _plain_ref_vit(img_size):
        rl.install()
        from functools import partial

        import torch.nn as nn

        from src.deit_vision_transformer import VisionTransformer as RefViT

        torch.manual_seed(0)
        return RefViT(img_size=img_size, patch_size=16, embed_dim=24,
                      depth=2, num_heads=3, mlp_ratio=4, qkv_bias=True,
                      num_classes=10,
                      norm_layer=partial(nn.LayerNorm, eps=1e-6),
                      act_layer=nn.GELU)

    def test_e2e_240_import_matches_reference_filter(self):
        """Our convert+merge at img_size=240 produces the same pos_embed
        the reference's checkpoint_filter_fn installs in a 240 model, and
        identical logits from the resulting torch/jax pair.

        Non-distilled: the reference's own filter crashes on distilled
        checkpoints (DistilledVisionTransformer never sets num_tokens=2,
        src/deit.py:20-29, so checkpoint_filter_fn reshapes a 197-token
        'grid'); the distilled slot semantics are covered by the golden
        tests above with explicit num_tokens=2."""
        import jax
        import jax.numpy as jnp

        from ofq_tpu.models import DeiTConfig, VisionTransformer
        from ofq_tpu.quant import policy_from_args

        rl.install()
        from src.deit_vision_transformer import checkpoint_filter_fn

        m224 = self._plain_ref_vit(224)
        g = torch.Generator().manual_seed(11)
        with torch.no_grad():
            for p in m224.parameters():
                p.add_(0.05 * torch.randn(p.shape, generator=g))
        sd_t = m224.state_dict()

        # reference side: build the 240 model, load through its own filter
        m240 = self._plain_ref_vit(240)
        filtered = checkpoint_filter_fn({k: v.clone() for k, v in
                                         sd_t.items()}, m240)
        m240.load_state_dict(filtered, strict=True)
        m240.eval()

        # our side: same checkpoint into an img_size=240 flax model
        sd = {k: v.detach().numpy() for k, v in sd_t.items()}
        cfg = DeiTConfig(img_size=240, patch_size=16, embed_dim=24, depth=2,
                         num_heads=3, num_classes=10, distilled=False)
        model = VisionTransformer(cfg=cfg, policy=policy_from_args(
            qmodules=()))
        gx = torch.Generator().manual_seed(12)
        x_t = torch.randn(2, 3, 240, 240, generator=gx)
        x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
        variables = jax.jit(
            lambda k, xx: model.init({"params": k}, xx, train=False)
        )(jax.random.key(0), x)
        loaded = convert_deit(sd, depth=2, img_size=240)
        params = merge_pretrained(variables["params"], loaded)

        # pos_embed went through the resize (shape changed 197 -> 226)
        assert np.asarray(params["pos_embed"]).shape == (1, 1 + 15 * 15, 24)
        np.testing.assert_allclose(
            np.asarray(params["pos_embed"]),
            m240.pos_embed.detach().numpy(), atol=1e-5, rtol=1e-5)

        ours = jax.jit(lambda p, xx: model.apply(
            {**variables, "params": p}, xx, train=False)[0]
        )(jax.tree.map(jnp.asarray, params), x)
        with torch.no_grad():
            theirs, _ = m240(x_t)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   atol=1e-4, rtol=1e-4)

    def test_e2e_distilled_240_matches_reference_resize(self):
        """Distilled import at 240: our merged pos_embed equals the
        reference's resize_pos_embed applied with the correct num_tokens=2
        (the fixed-filter semantics; slots preserved, grid resampled)."""
        import jax
        import jax.numpy as jnp

        from ofq_tpu.models import DeiTConfig, VisionTransformer
        from ofq_tpu.quant import policy_from_args

        m224 = rl.build_reference_deit(depth=2, embed_dim=24, num_heads=3,
                                       num_classes=10, img_size=224)
        g = torch.Generator().manual_seed(13)
        with torch.no_grad():
            for p in m224.parameters():
                p.add_(0.05 * torch.randn(p.shape, generator=g))
        sd = {k: v.detach().numpy() for k, v in m224.state_dict().items()}

        cfg = DeiTConfig(img_size=240, patch_size=16, embed_dim=24, depth=2,
                         num_heads=3, num_classes=10)
        model = VisionTransformer(cfg=cfg, policy=policy_from_args(
            qmodules=()))
        x = jnp.zeros((1, 240, 240, 3), jnp.float32)
        variables = jax.jit(
            lambda k, xx: model.init({"params": k}, xx, train=False)
        )(jax.random.key(0), x)
        params = merge_pretrained(variables["params"],
                                  convert_deit(sd, depth=2, img_size=240))
        want = _ref_resize(sd["pos_embed"], 2 + 15 * 15, num_tokens=2)
        np.testing.assert_allclose(np.asarray(params["pos_embed"]), want,
                                   atol=1e-5, rtol=1e-5)
