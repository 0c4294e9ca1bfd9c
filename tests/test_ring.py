"""Ring attention (context parallelism, ``parallel/ring_attention.py``).

No reference counterpart (SURVEY.md §2.4: no SP/CP upstream) — this is the
scaling path for token counts beyond one chip.  Exactness contract: equal
to the backbone's dense masked attention (``backbone._attention_xla`` under
``make_masks`` semantics) for forward AND gradients, on the virtual
8-device mesh with K/V genuinely rotating via ppermute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.config import Config, ParallelConfig
from fluid_llm_tpu.models import backbone as bb
from fluid_llm_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from fluid_llm_tpu.parallel.ring_attention import ring_attention
from fluid_llm_tpu.train.optim import partition
from fluid_llm_tpu.train.trainer import Trainer


def _rand_qkv(key, bs=2, L=32, H=4, hd=8):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (bs, L, H, hd), jnp.float32)
    k = jax.random.normal(kk, (bs, L, H, hd), jnp.float32)
    v = jax.random.normal(kv, (bs, L, H, hd), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("n_invalid", [0, 7])
def test_ring_matches_dense_forward(n_invalid):
    """ring over model=4 == dense XLA attention, including the rollout's
    front-invalid window slots."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    bs, L = q.shape[:2]
    valid = jnp.asarray(np.arange(L)[None, :] >= n_invalid).repeat(bs, 0)

    _, allowed = bb.make_masks(valid)
    dense = bb._attention_xla(q, k, v, allowed, jnp.float32)

    mesh = make_mesh(ParallelConfig(model_axis=4))
    ring = jax.jit(
        lambda a, b, c, w: ring_attention(a, b, c, w, mesh, "model")
    )(q, k, v, valid)
    np.testing.assert_allclose(
        np.asarray(ring)[valid], np.asarray(dense)[valid], atol=2e-5, rtol=1e-5
    )


def test_ring_matches_dense_gradients():
    """d/dq, d/dk, d/dv of a masked quadratic loss match the dense path —
    the ppermute ring is differentiated through."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(1))
    bs, L = q.shape[:2]
    valid = jnp.asarray(np.arange(L)[None, :] >= 5).repeat(bs, 0)
    w = valid[:, :, None, None].astype(jnp.float32)
    _, allowed = bb.make_masks(valid)
    mesh = make_mesh(ParallelConfig(model_axis=4))

    def loss_ring(q, k, v):
        return jnp.sum((ring_attention(q, k, v, valid, mesh, "model") * w) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum((bb._attention_xla(q, k, v, allowed, jnp.float32) * w) ** 2)

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(gr, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_ring_rejects_uneven_tokens():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), L=30)
    valid = jnp.ones((2, 30), bool)
    mesh = make_mesh(ParallelConfig(model_axis=4))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, valid, mesh, "model")


def test_ring_train_step_matches_dense():
    """Full train step with parallel.ring_attention on a data=2 x model=4
    mesh == the unsharded step (token count sized to divide the ring)."""
    from test_model import tiny_setup

    # no BOS, no see-init duplicate -> 4 frames x 16 patches = 64 tokens
    cfg, ds, props, model, batch = tiny_setup(
        seq_len=4, decoder="MLP", use_bos_token=False, see_init_state=False,
    )
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch4 = tuple(np.concatenate([np.asarray(x)] * 2, axis=0) for x in batch)
    _, _, m0 = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, batch4, jax.random.PRNGKey(1)
    )

    par = ParallelConfig(model_axis=4, seq_sharded_acts=True, ring_attention=True)
    cfg_r = cfg.replace(parallel=par)
    model_r = model.__class__(
        cfg=cfg_r, ds_props=model.ds_props, backbone_cfg=model.backbone_cfg
    )
    mesh = make_mesh(par)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 1, "model": 4}
    trainer_r = Trainer(model_r)
    full = shard_params(model_r.init(jax.random.PRNGKey(0)), mesh, par)
    tr, fr = partition(full, model_r.trainable_mask(full))
    _, _, m1 = trainer_r.train_step_autoreg(
        tr, fr, trainer_r.opt.init(tr), shard_batch(batch4, mesh),
        jax.random.PRNGKey(1),
    )
    np.testing.assert_allclose(
        float(m0["loss"]), float(m1["loss"]), rtol=2e-5
    )


def test_ring_train_step_pads_odd_tokens():
    """The model pads indivisible token counts with masked tokens before the
    ring (the reference window is 661 tokens): BOS + see-init on -> 81
    tokens, padded to 84 over model=4 — still equal to the dense step."""
    from test_model import tiny_setup

    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch4 = tuple(np.concatenate([np.asarray(x)] * 2, axis=0) for x in batch)
    _, _, m0 = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, batch4, jax.random.PRNGKey(1)
    )

    par = ParallelConfig(model_axis=4, seq_sharded_acts=True, ring_attention=True)
    model_r = model.__class__(
        cfg=cfg.replace(parallel=par), ds_props=model.ds_props,
        backbone_cfg=model.backbone_cfg,
    )
    mesh = make_mesh(par)
    trainer_r = Trainer(model_r)
    full = shard_params(model_r.init(jax.random.PRNGKey(0)), mesh, par)
    tr, fr = partition(full, model_r.trainable_mask(full))
    _, _, m1 = trainer_r.train_step_autoreg(
        tr, fr, trainer_r.opt.init(tr), shard_batch(batch4, mesh),
        jax.random.PRNGKey(1),
    )
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=2e-5)


def test_ring_requires_seq_sharding():
    from test_model import tiny_setup

    cfg, ds, props, model, batch = tiny_setup(
        seq_len=4, decoder="MLP", use_bos_token=False, see_init_state=False,
    )
    cfg_r = cfg.replace(parallel=ParallelConfig(ring_attention=True))
    model_r = model.__class__(
        cfg=cfg_r, ds_props=model.ds_props, backbone_cfg=model.backbone_cfg
    )
    params = model_r.init(jax.random.PRNGKey(0))
    states, _, _, _, pos = batch
    with pytest.raises(ValueError, match="seq_sharded_acts"):
        model_r.forward(params, states, pos)
