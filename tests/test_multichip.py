"""The driver-checked multi-device gate, run as a pytest every round.

Runs the FULL sharded train step (data-parallel mesh, real in-step
collectives) on the 8-virtual-device CPU backend that conftest.py
forces. Mirrors reference DDP semantics
(/root/reference/tools/train.py:51-54).
"""
import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert jax.device_count() >= 8, 'conftest must provide 8 CPU devices'
    import __graft_entry__ as g
    # In-process path: conftest already forced an 8-device CPU backend,
    # so no subprocess re-exec happens here.
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_loss_equals_single_device():
    """8-way data-sharded loss == single-device loss on the same global
    batch (the reference's reduce_mean loss-normalizer semantics,
    reference grounding_head.py:745-758: bbox loss is normalized by the
    all-reduced positive count, so sharding must not change the value).
    """
    assert jax.device_count() >= 8
    import __graft_entry__ as g
    from proxytransformation_tpu.parallel import make_mesh, shard_batch

    model = g._tiny_model()
    batch = g._tiny_batch(B=8, with_targets=True)
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, mode='loss', train=False))(
            jax.random.PRNGKey(0), batch)

    def total_loss(v, b):
        out = model.apply(v, b, mode='loss', train=False)
        return sum(jax.tree_util.tree_leaves(out))

    loss_1dev = float(jax.jit(total_loss)(variables, batch))
    sharded = shard_batch(batch, make_mesh(8))
    loss_8dev = float(jax.jit(total_loss)(variables, sharded))
    assert loss_1dev == pytest.approx(loss_8dev, rel=1e-4), (
        loss_1dev, loss_8dev)
