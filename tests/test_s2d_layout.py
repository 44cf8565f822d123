"""conv_layout="s2d" — exact-equivalence pins for the space-to-depth
conv layout (nn/conv.py; productized from benchmarks/bench_s2d.py, the
on-chip counter-experiment in BASELINE.md's roofline section).

The s2d layout must be a pure re-expression: same params, same math —
losses AND gradients equal between layouts for both model families.
"""

# Importing the submodule binds ``jax`` too (flatten_util is not loaded
# by ``import jax`` alone).
import jax.flatten_util as _flatten_util  # noqa: F401
import jax
import jax.numpy as jnp
import pytest

from multimodal_mtrssm_tpu.nn.conv import (
    DecoderConfig,
    EncoderConfig,
    decoder_apply,
    decoder_apply_s2d,
    decoder_init,
    decoder_s2d_applicable,
    depth_to_space,
    encoder_apply,
    encoder_apply_s2d,
    encoder_init,
    encoder_s2d_applicable,
    space_to_depth,
)


def test_space_to_depth_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 5))
    s = space_to_depth(x)
    assert s.shape == (2, 3, 4, 4, 20)
    assert jnp.array_equal(depth_to_space(s), x)


def test_encoder_s2d_exact():
    cfg = EncoderConfig()
    params = encoder_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 32, 32, 1))
    base = encoder_apply(params, cfg, x)
    s2d = encoder_apply_s2d(params, cfg, x)
    assert s2d.shape == base.shape
    assert float(jnp.max(jnp.abs(base - s2d))) < 1e-5


def test_encoder_s2d_exact_no_coordconv():
    cfg = EncoderConfig(coord_conv=False)
    params = encoder_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 1))
    base = encoder_apply(params, cfg, x)
    s2d = encoder_apply_s2d(params, cfg, x)
    assert float(jnp.max(jnp.abs(base - s2d))) < 1e-5


@pytest.mark.parametrize("cfg", [
    # Non-default depths/widths/grids: the weight gathers must generalize
    # beyond the default 3-conv 32x32 stack.
    EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2),
                  paddings=(1, 1), in_hw=(16, 16), linear_sizes=(16,),
                  num_residual_blocks=1, residual_intermediate_size=8,
                  residual_output_size=8),
    EncoderConfig(channels=(8, 16, 32, 32), kernel_sizes=(3,) * 4,
                  strides=(2,) * 4, paddings=(1,) * 4, in_hw=(32, 32),
                  linear_sizes=(24,), num_residual_blocks=0),
], ids=["depth2-16px", "depth4-no-res"])
def test_encoder_s2d_exact_nondefault(cfg):
    assert encoder_s2d_applicable(cfg)
    params = encoder_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, *cfg.in_hw, 1))
    base = encoder_apply(params, cfg, x)
    s2d = encoder_apply_s2d(params, cfg, x)
    assert float(jnp.max(jnp.abs(base - s2d))) < 1e-5


@pytest.mark.parametrize("in_features", [48, 96])
def test_decoder_s2d_exact(in_features):
    cfg = DecoderConfig(in_features=in_features)
    params = decoder_init(jax.random.PRNGKey(0), cfg)
    f = jax.random.normal(jax.random.PRNGKey(1), (4, 5, in_features))
    base = decoder_apply(params, cfg, f)
    phases = decoder_apply_s2d(params, cfg, f)
    assert phases.shape == (4, 5, 16, 16, 4)
    assert float(jnp.max(jnp.abs(base - depth_to_space(phases)))) < 1e-5


def test_applicability_guards():
    assert encoder_s2d_applicable(EncoderConfig())
    assert not encoder_s2d_applicable(EncoderConfig(strides=(2, 2, 1)))
    assert not encoder_s2d_applicable(EncoderConfig(kernel_sizes=(5, 3, 3)))
    assert not encoder_s2d_applicable(EncoderConfig(in_channels=3))
    assert not encoder_s2d_applicable(EncoderConfig(in_hw=(12, 12)))
    assert decoder_s2d_applicable(DecoderConfig(in_features=48))
    assert not decoder_s2d_applicable(DecoderConfig(in_features=48, kernel_sizes=(4, 4, 3)))
    assert not decoder_s2d_applicable(DecoderConfig(in_features=48, strides=(2, 2, 1)))


def test_model_rejects_ineligible_s2d():
    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig

    with pytest.raises(ValueError, match="s2d-eligible"):
        MoPoEMRSSM(MRSSMConfig(
            conv_layout="s2d",
            audio_encoder=EncoderConfig(strides=(2, 2, 1)),
        ))
    with pytest.raises(ValueError, match="conv_layout"):
        MoPoEMRSSM(MRSSMConfig(conv_layout="weird"))


def test_auto_layout_resolution():
    """conv_layout="auto" (the default) picks s2d exactly at the widths
    where the on-chip A/B measured it faster: toy-width stacks -> s2d;
    wide-channel stacks (the 27M config regime, measured 0.93x) and
    s2d-ineligible stacks -> nhwc WITHOUT raising."""
    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
    from multimodal_mtrssm_tpu.models.mmtrssm import MMTRSSMConfig, MoPoEMMTRSSM
    from multimodal_mtrssm_tpu.nn.conv import s2d_auto_profitable

    # Default (toy-width) config: auto == s2d for both families.
    assert MoPoEMRSSM(MRSSMConfig()).cfg.conv_layout == "auto"
    assert MoPoEMRSSM(MRSSMConfig())._use_s2d
    assert MoPoEMMTRSSM(MMTRSSMConfig())._use_s2d

    # Wide channels (any expanded read past one 128-lane tile): nhwc.
    wide = EncoderConfig(channels=(32, 64, 128, 256), kernel_sizes=(3,) * 4,
                         strides=(2,) * 4, paddings=(1,) * 4, in_hw=(64, 64))
    assert not MoPoEMRSSM(MRSSMConfig(
        audio_encoder=wide, vision_encoder=wide))._use_s2d
    assert not s2d_auto_profitable((wide,), ())

    # Boundary: last-read channel 32 (expanded 128) still qualifies.
    edge = EncoderConfig(channels=(32, 64), kernel_sizes=(3, 3),
                         strides=(2, 2), paddings=(1, 1))
    assert s2d_auto_profitable((edge,), ())

    # Ineligible stacks fall back silently under auto (explicit s2d raises).
    assert not MoPoEMRSSM(MRSSMConfig(
        audio_encoder=EncoderConfig(strides=(2, 2, 1))))._use_s2d


def _batch(key, B=3, T=4):
    ks = jax.random.split(key, 3)
    act = jax.random.normal(ks[0], (B, T, 6))
    aud = jax.random.uniform(ks[1], (B, T, 32, 32, 1), minval=-1, maxval=1)
    vis = jax.random.uniform(ks[2], (B, T, 32, 32, 1), minval=-1, maxval=1)
    return (act, aud, vis, act, aud, vis)


@pytest.mark.parametrize("family", ["mrssm", "mmtrssm"])
def test_shared_step_loss_and_grads_match_across_layouts(family):
    """conv_layout must not change the training math: loss and every
    parameter gradient agree between layouts (same params, same key)."""
    if family == "mrssm":
        from multimodal_mtrssm_tpu.models import MoPoEMRSSM as Model, MRSSMConfig as Cfg
    else:
        from multimodal_mtrssm_tpu.models import MoPoEMMTRSSM as Model, MMTRSSMConfig as Cfg

    base = Model(Cfg(use_pallas_train=False, conv_layout="nhwc"))
    s2d = Model(Cfg(use_pallas_train=False, conv_layout="s2d"))
    params = base.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)

    def loss_of(model):
        return lambda p: model.shared_step(p, batch, key)["loss"]

    l_base, g_base = jax.value_and_grad(loss_of(base))(params)
    l_s2d, g_s2d = jax.value_and_grad(loss_of(s2d))(params)
    assert jnp.allclose(l_base, l_s2d, rtol=1e-5), (l_base, l_s2d)
    flat_base, _ = jax.flatten_util.ravel_pytree(g_base)
    flat_s2d, _ = jax.flatten_util.ravel_pytree(g_s2d)
    scale = float(jnp.max(jnp.abs(flat_base))) + 1e-8
    gap = float(jnp.max(jnp.abs(flat_base - flat_s2d)))
    assert gap < 2e-3 * scale, f"grad gap {gap} vs scale {scale}"


def test_full_metrics_match_across_layouts():
    """Every shared_step metric (recon per modality, kl, loss) agrees."""
    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig

    base = MoPoEMRSSM(MRSSMConfig(use_pallas_train=False, conv_layout="nhwc"))
    s2d = MoPoEMRSSM(MRSSMConfig(use_pallas_train=False, conv_layout="s2d"))
    params = base.init(jax.random.PRNGKey(0))
    batch = _batch(jax.random.PRNGKey(1), B=2, T=3)
    key = jax.random.PRNGKey(2)
    m_base = base.shared_step(params, batch, key)
    m_s2d = s2d.shared_step(params, batch, key)
    assert set(m_base) == set(m_s2d)
    for k in m_base:
        assert jnp.allclose(m_base[k], m_s2d[k], rtol=1e-5, atol=1e-5), (
            k, m_base[k], m_s2d[k])
