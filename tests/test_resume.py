"""Preemption-safe checkpoint/resume of online training (SURVEY.md §5.3-5.4:
the reference cannot resume; we checkpoint the full train state + counters)."""

import numpy as np
import pytest

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.data.buffer import Buffer
from tdmpc2_tpu.envs import make_env
from tdmpc2_tpu.tdmpc2 import TDMPC2
from tdmpc2_tpu.trainer import OnlineTrainer
from tdmpc2_tpu.utils.logger import Logger



pytestmark = pytest.mark.slow  # checkpoint/resume loops

def _cfg(tmp_path, **kw):
    cfg = Config(task='toy-reach', batch_size=8, latent_dim=16, mlp_dim=32,
                 enc_dim=32, num_q=2, num_bins=5, num_samples=16,
                 num_elites=4, num_pi_trajs=2, iterations=1, horizon=3,
                 save_csv=False, eval_episodes=1, eval_freq=100)
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg = parse_cfg(cfg)
    cfg.work_dir = str(tmp_path / 'run')
    return cfg


def _trainer(cfg):
    env = make_env(cfg)
    cfg.seed_steps = 120
    agent = TDMPC2(cfg)
    return OnlineTrainer(cfg=cfg, env=env, agent=agent, buffer=Buffer(cfg),
                         logger=Logger(cfg))


def test_save_load_extra_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    make_env(cfg)
    agent = TDMPC2(cfg)
    fp = tmp_path / 'ck.pkl'
    agent.save(fp, extra={'step': 1234, 'ep_idx': 7})
    agent2 = TDMPC2(cfg)
    extra = agent2.load(str(fp))
    assert extra == {'step': 1234, 'ep_idx': 7}
    # full state restored, including the PRNG key
    assert np.array_equal(np.asarray(agent2.state.key),
                          np.asarray(agent.state.key))
    a = jnp_leaves_equal(agent.state.params, agent2.state.params)
    assert a


def jnp_leaves_equal(t1, t2):
    import jax
    return all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)))


def test_online_resume_continues_from_checkpoint(tmp_path):
    cfg = _cfg(tmp_path, steps=200)
    t1 = _trainer(cfg)
    t1.train()  # checkpoints 'latest' at each eval boundary
    ckpt = tmp_path / 'run' / 'models' / 'latest.pkl'
    assert ckpt.exists()

    cfg2 = _cfg(tmp_path, steps=260, resume=True)
    t2 = _trainer(cfg2)
    t2.maybe_resume()
    assert t2._step > 0  # picked up the saved counter
    resumed_step = t2._step
    t2.train()           # maybe_resume inside train() is idempotent
    assert t2._step >= max(260, resumed_step)


def test_resume_refill_gate_suppresses_updates(tmp_path):
    """After a resume (always an EMPTY replay buffer — it is not
    checkpointed), no gradient updates may run until the restored policy
    has re-collected cfg.resume_refill_steps env steps: the normal
    1-update-per-step rate on a nearly-empty buffer diverges a trained
    value function (observed live: walker-rgb resume @250k, eval 923 ->
    collection reward 85 in 8k steps). The forgone updates are NOT made
    up afterwards."""
    cfg = _cfg(tmp_path, steps=200)
    t1 = _trainer(cfg)
    t1.train()
    resumed_from = 200  # checkpoints land on eval boundaries (eval_freq=100)

    cfg2 = _cfg(tmp_path, steps=320, resume=True)
    cfg2.resume_refill_steps = 60
    t2 = _trainer(cfg2)
    t2.train()
    assert t2._resumed and t2._resume_step >= resumed_from
    # every update draws exactly once from the (fresh) buffer: with the
    # gate the only updates are the ~steps-past-(resume+60); without it
    # the count would be ~(steps - resume_step)
    span = t2._step - t2._resume_step
    gated_span = span - 60
    assert 0 < t2.buffer._draws <= gated_span + 5, (
        f'draws={t2.buffer._draws}, span={span}')

    # explicit 0 disables the gate entirely
    cfg3 = _cfg(tmp_path, steps=t2._step + 40, resume=True)
    cfg3.resume_refill_steps = 0
    t3 = _trainer(cfg3)
    t3.train()
    # updates resume as soon as the first episode flushes (no 60-step gate);
    # the toy episode is ~50 steps, so only the tail of the span draws
    assert t3.buffer._draws >= 5


def test_resume_with_snapshot_restores_data_and_credit(tmp_path):
    """cfg.buffer_snapshot_eps checkpoints a replay tail next to the model;
    resume restores it and its steps count toward the refill gate, so a
    data-backed resume updates from the first new steps instead of
    re-seeding blind (the walker-rgb r5 destabilization class)."""
    cfg = _cfg(tmp_path, steps=200)
    cfg.buffer_snapshot_eps = 3
    t1 = _trainer(cfg)
    t1.train()
    assert (tmp_path / 'run' / 'models' / 'buffer.npz').exists()

    cfg2 = _cfg(tmp_path, steps=260, resume=True)
    cfg2.buffer_snapshot_eps = 3
    cfg2.resume_refill_steps = 100
    t2 = _trainer(cfg2)
    t2.train()
    # ~3 x 50-step toy episodes of credit cover the 100-step gate
    assert getattr(t2, '_refill_credit', 0) >= 100
    assert t2.buffer.num_eps >= 3          # snapshot + new episodes
    assert t2.buffer._draws >= 30          # updates ran from the first steps


def test_resume_without_checkpoint_starts_fresh(tmp_path):
    cfg = _cfg(tmp_path, steps=0, resume=True)
    cfg.steps = 1  # satisfy the assert; loop runs briefly
    t = _trainer(cfg)
    t.maybe_resume()
    assert t._step == 0


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax directory checkpoints (.orbax suffix) round-trip the full
    train state + metadata."""
    pytest = __import__('pytest')
    pytest.importorskip('orbax.checkpoint')
    cfg = _cfg(tmp_path)
    from tdmpc2_tpu.envs import make_env
    make_env(cfg)
    from tdmpc2_tpu.tdmpc2 import TDMPC2
    agent = TDMPC2(cfg)
    fp = tmp_path / 'state.orbax'
    agent.save(fp, extra={'step': 42})
    agent.save(fp, extra={'step': 43})  # overwrite works
    agent2 = TDMPC2(cfg)
    extra = agent2.load(str(fp))
    assert int(extra['step']) == 43
    assert jnp_leaves_equal(agent.state.params, agent2.state.params)


def test_checkpoint_arch_mismatch_raises(tmp_path):
    """Checkpoints carry architecture metadata; loading into a mismatched
    cfg must fail with a clear error, not an opaque tree error."""
    cfg = _cfg(tmp_path)
    make_env(cfg)
    agent = TDMPC2(cfg)
    fp = tmp_path / 'ck.pkl'
    agent.save(fp, extra={'step': 7})

    bad_cfg = _cfg(tmp_path, mlp_dim=64)
    make_env(bad_cfg)
    other = TDMPC2(bad_cfg)
    with pytest.raises(ValueError, match='architecture does not match'):
        other.load(fp)
    # matching arch still loads and returns extra metadata
    again = TDMPC2(cfg)
    assert again.load(fp)['step'] == 7
