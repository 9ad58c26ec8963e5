"""Config parser parity: multitask geometry (mt30/mt80), MODEL_SIZE
expansion, and the published-experiment quirks (reference
tdmpc2/common/parser.py:29-80, common/__init__.py:1-60).

The TASK_SET / MODEL_SIZE tables are behavioral-parity constants (list
order defines the task-embedding index of every published checkpoint), so
when the reference checkout is present they are asserted EQUAL to the
reference's tables, parsed from its source at test time."""

import ast
from pathlib import Path

import pytest

from tdmpc2_tpu.config import MODEL_SIZE, TASK_SET, Config, parse_cfg

_REF = Path('/root/reference/tdmpc2/common/__init__.py')


def test_mt80_geometry():
    cfg = parse_cfg(Config(task='mt80', model_size=48))
    assert cfg.multitask
    assert len(cfg.tasks) == 80
    assert cfg.task_dim == 96
    # MODEL_SIZE[48] expansion
    assert (cfg.enc_dim, cfg.mlp_dim, cfg.latent_dim, cfg.num_enc_layers) \
        == (1792, 1792, 768, 4)
    # mt30 is an exact prefix: embedding indices shared across task sets
    assert cfg.tasks[:30] == TASK_SET['mt30']
    assert all(t.startswith('mw-') for t in cfg.tasks[30:])


def test_mt30_19m_latent_quirk():
    cfg = parse_cfg(Config(task='mt30', model_size=19))
    assert cfg.latent_dim == 512      # published-checkpoint quirk
    assert cfg.task_dim == 64
    # the quirk is mt30-specific
    assert parse_cfg(Config(task='mt80', model_size=19)).latent_dim == 768


@pytest.mark.parametrize('task,size,expected', [
    ('mt30', 5, 64), ('mt30', 48, 64), ('mt30', 1, 96), ('mt30', 317, 96),
    ('mt80', 5, 96), ('mt80', 317, 96),
])
def test_task_dim_rule(task, size, expected):
    assert parse_cfg(Config(task=task, model_size=size)).task_dim == expected


def test_single_task_has_no_task_dim():
    cfg = parse_cfg(Config(task='walker-walk'))
    assert not cfg.multitask and cfg.task_dim == 0 and cfg.tasks == ['walker-walk']


def _ref_tables():
    """Parse MODEL_SIZE/TASK_SET literals out of the reference source
    without importing it (torch-free)."""
    tree = ast.parse(_REF.read_text())
    out = {}
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id in ('MODEL_SIZE', 'TASK_SET'):
                    out[t.id] = ast.literal_eval(node.value)
    return out


@pytest.mark.skipif(not _REF.exists(), reason='reference checkout absent')
def test_task_set_matches_reference():
    ref = _ref_tables()['TASK_SET']
    assert TASK_SET['mt30'] == list(ref['mt30'])
    assert TASK_SET['mt80'] == list(ref['mt80'])


@pytest.mark.skipif(not _REF.exists(), reason='reference checkout absent')
def test_model_size_matches_reference():
    ref = _ref_tables()['MODEL_SIZE']
    for size, ours in MODEL_SIZE.items():
        theirs = ref[size]
        for k, v in ours.items():
            assert theirs[k] == v, (size, k)
        # any key the reference sets that we do not must equal our default
        defaults = Config()
        for k, v in theirs.items():
            if k not in ours:
                assert getattr(defaults, k) == v, (size, k)
