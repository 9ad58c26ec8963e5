"""Trainer base (reference: tdmpc2/trainer/base.py)."""

from __future__ import annotations


class Trainer:
    def __init__(self, cfg, env, agent, buffer, logger):
        self.cfg = cfg
        self.env = env
        self.agent = agent
        self.buffer = buffer
        self.logger = logger
        print('Agent parameters: '
              f'{agent.model.total_params(agent.state.params):,}')

    def eval(self):
        raise NotImplementedError

    def train(self):
        raise NotImplementedError

    def finish(self):
        """End-of-run teardown: stop the buffer's prefetch thread (if any),
        worker-process envs, and flush/save via the logger."""
        self.logger.finish(self.agent)
        if hasattr(self.buffer, 'close'):
            self.buffer.close()
        if hasattr(self.env, 'close'):
            try:
                self.env.close()
            except Exception:
                pass
