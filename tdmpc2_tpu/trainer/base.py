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
