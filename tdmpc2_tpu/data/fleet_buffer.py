"""Seed-stacked replay buffer for fleet training (K seeds in one process).

No reference counterpart (the reference trains one seed per process,
tdmpc2/train.py:26-60; seeds are the outermost grid axis of its published
results, results/tdmpc2/*.csv). On a TPU whose per-dispatch latency dominates
the online loop, K independent buffers would cost K sample dispatches per
vector step; here the seed axis is a leading array axis — storage leaves are
[K, capacity_eps, rows, ...] in HBM and ONE jitted call draws all K seeds'
batches (`jax.vmap` over the same episode-slice sampler as data/buffer.py,
with a per-seed fold_in key), so fleet replay costs exactly what single-seed
replay costs: one dispatch.

Device-resident only (fleet training targets state-based tasks whose storage
is tens of MB per seed; pixel fleets would contend for HBM with K copies of
the conv activations anyway — use single-seed runs for rgb).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tdmpc2_tpu.data.buffer import draw_slice_indices


class FleetBuffer:
    """K per-seed episode rings with fused cross-seed sampling.

    Episode semantics (bootstrap row, strict-length drop, slice-uniform
    episode weighting) are identical to data/buffer.py; see its docstrings
    for the reference citations.
    """

    def __init__(self, cfg, num_seeds: int, mesh=None):
        assert cfg.get('obs') != 'rgb', \
            'FleetBuffer is state-only; run rgb tasks single-seed'
        self.cfg = cfg
        self.mesh = mesh  # optional: shard the seed axis across devices
        self.K = int(num_seeds)
        self._capacity = int(min(cfg.buffer_size, cfg.steps))
        self._rows = int(cfg.episode_length) + 1
        self._capacity_eps = max(1, self._capacity // int(cfg.episode_length))
        self._horizon = int(cfg.horizon)
        self._batch_size = int(cfg.batch_size)
        self._num_eps = np.zeros(self.K, np.int64)   # per-seed episode count
        self._storage = None
        self._key = jax.random.PRNGKey(cfg.seed + 0xF1EE7)
        self._draws = 0
        # add() writes blocks of exactly 1 or `num_envs` episodes so the
        # donated add jit compiles at most two shapes (episodic tasks finish
        # variable counts per step; unbounded block sizes would trigger a
        # multi-second XLA compile per new size, mid-run)
        self._block = max(1, int(cfg.get('num_envs') or 1))

    @property
    def num_eps(self) -> int:
        """Smallest per-seed episode count (sampling is safe iff > 0)."""
        return int(self._num_eps.min())

    def _init_storage(self, ep: dict):
        shapes = {k: v.shape[1:] for k, v in ep.items()}
        dtypes = {k: v.dtype for k, v in ep.items()}
        bytes_per_row = sum(
            int(np.prod(shapes[k])) * np.dtype(dtypes[k]).itemsize for k in ep)
        total = bytes_per_row * self._rows * self._capacity_eps * self.K
        print(f'Fleet buffer: {self.K} seeds x {self._capacity_eps:,} episodes '
              f'x {self._rows} rows -> {total / 1e9:.2f} GB DEVICE (HBM)')
        self._storage = {
            k: jnp.zeros(
                (self.K, self._capacity_eps, self._rows) + tuple(shapes[k]),
                dtypes[k]) for k in ep}
        self._ep_rows = jnp.zeros((self.K, self._capacity_eps), jnp.int32)
        if self.mesh is not None:
            # per-seed replay rings live on the device that owns the seed
            from tdmpc2_tpu import parallel
            self._storage = parallel.shard_seed_axis(self._storage, self.mesh)
            self._ep_rows = parallel.shard_seed_axis(self._ep_rows, self.mesh)
        n_store = len(self._storage)
        self._add_jit = jax.jit(
            self._add_device, donate_argnums=tuple(range(n_store + 1)))
        self._sample_jit = jax.jit(self._sample_device,
                                   static_argnames=('n_batches',))

    def add(self, seed_idx: int, episodes: dict) -> int:
        """Add a block of episodes to one seed's ring: dict of [M, rows, ...]
        arrays (M >= 1), optional 'valid_rows' [M]. One donated device write
        per call (the fleet trainer flushes all of a seed's finished episodes
        together). Returns the seed's episode count."""
        episodes = dict(episodes)
        valid = episodes.pop('valid_rows', None)
        m = int(episodes['reward'].shape[0])
        if valid is None:
            valid = np.full((m,), self._rows, np.int32)
        else:
            valid = np.asarray(valid, np.int32).reshape(m)
        keep = valid >= self._horizon + 1   # torchrl strict_length drop
        if not keep.all():
            episodes = {k: np.asarray(v)[keep] for k, v in episodes.items()}
            valid = valid[keep]
            m = int(valid.shape[0])
        if m == 0:
            return int(self._num_eps[seed_idx])
        for k, v in episodes.items():
            v = np.asarray(v)
            if v.dtype == np.float64:
                v = v.astype(np.float32)
            if v.shape[1] < self._rows:
                pad = [(0, 0), (0, self._rows - v.shape[1])] + \
                    [(0, 0)] * (v.ndim - 2)
                v = np.pad(v, pad)
            episodes[k] = v
        if self._storage is None:
            self._init_storage({k: v[0] for k, v in episodes.items()})

        i = 0
        while i < m:
            slot = int(self._num_eps[seed_idx]) % self._capacity_eps
            room = self._capacity_eps - slot
            avail = min(m - i, room)
            # fixed block sizes {num_envs, 1} -> bounded jit shapes. A
            # partial flush (an episodic fleet finishing fewer than num_envs
            # episodes) is PADDED to the full block with valid_rows=0
            # episodes — one dispatch instead of up to num_envs on the
            # latency-bound tunnel. Pad slots carry zero sampling weight
            # (draw_slice_indices weights by rows - horizon) and are
            # overwritten by the next add (num_eps advances by the real
            # count only). At the ring-wrap boundary (< block slots of room,
            # once per cycle) episodes are written one at a time.
            if avail >= self._block:
                n, pad = self._block, 0
            elif room >= self._block:
                n, pad = avail, self._block - avail
            else:
                n, pad = 1, 0
            names = sorted(self._storage)

            def blk(v):
                b = np.ascontiguousarray(v[i:i + n])
                if pad:
                    b = np.pad(b, [(0, pad)] + [(0, 0)] * (b.ndim - 1))
                return b

            outs = self._add_jit(
                *[self._storage[k] for k in names],
                self._ep_rows,
                *[blk(episodes[k]) for k in names],
                blk(valid), np.int32(seed_idx), np.int32(slot))
            self._storage = dict(zip(names, outs[:-1]))
            self._ep_rows = outs[-1]
            self._num_eps[seed_idx] += n
            i += n
        return int(self._num_eps[seed_idx])

    @staticmethod
    def _add_device(*args):
        """(storage leaves..., ep_rows, block leaves..., valid, seed, slot)"""
        n = (len(args) - 4) // 2
        storage, ep_rows = args[:n], args[n]
        blocks, valid, seed, slot = args[n + 1:-3], args[-3], args[-2], args[-1]
        out = tuple(
            jax.lax.dynamic_update_slice(
                s, b.astype(s.dtype)[None],
                (seed, slot) + (0,) * (s.ndim - 2))
            for s, b in zip(storage, blocks))
        ep_rows = jax.lax.dynamic_update_slice(
            ep_rows, valid[None], (seed, slot))
        return out + (ep_rows,)

    # ------------------------------------------------------------- snapshot

    def save_snapshot(self, fp, max_episodes: int) -> int:
        """Write every seed's most recent S = min(max_episodes, min per-seed
        count) ring episodes to `fp` (npz, arrays [K, S, rows, ...]). One
        device gather + fetch per storage leaf (~30 MB for a 3-seed state
        fleet at S=200), not a full-ring fetch. Returns the MIN per-seed env
        steps captured — the conservative refill-gate credit. Same rationale
        as Buffer.save_snapshot (resume-with-empty-buffer destabilization)."""
        if self._storage is None or self.num_eps == 0:
            return 0
        s = min(int(max_episodes), self.num_eps, self._capacity_eps)
        idxs = np.stack([
            [(int(self._num_eps[k]) - s + i) % self._capacity_eps
             for i in range(s)] for k in range(self.K)])          # [K, S]
        gather = jax.jit(jax.vmap(lambda a, ix: a[ix]))
        jidx = jnp.asarray(idxs)
        out = {f'ep__{name}': np.asarray(gather(arr, jidx))
               for name, arr in self._storage.items()}
        rows = np.asarray(gather(self._ep_rows, jidx)).astype(np.int32)
        out['valid_rows'] = rows
        with open(fp, 'wb') as f:
            np.savez(f, **out)
        return int((rows.astype(np.int64) - 1).sum(axis=1).min())

    def load_snapshot(self, fp) -> int:
        """Restore a fleet `save_snapshot` file (seed count must match).
        Returns the min per-seed env steps restored (refill-gate credit)."""
        data = np.load(fp, allow_pickle=False)
        rows = data['valid_rows'].astype(np.int32)                # [K, S]
        if rows.shape[0] != self.K:
            print(f'Fleet snapshot has {rows.shape[0]} seeds, need '
                  f'{self.K}; skipping restore.')
            return 0
        episodes = {n[4:]: data[n] for n in data.files
                    if n.startswith('ep__')}
        for k in range(self.K):
            ep_k = {name: v[k] for name, v in episodes.items()}
            ep_k['valid_rows'] = rows[k]
            self.add(k, ep_k)
        return int((rows.astype(np.int64) - 1).sum(axis=1).min())

    def sample_many(self, n: int):
        """One device call -> per-seed update batches.

        Returns (obs [K, n, T+1, B, ...], action [K, n, T, B, A],
        reward/terminated [K, n, T, B, 1], None) — the leaves the fleet
        agent's vmapped `_update_scan` consumes (n == per-seed update count
        per vector step). For n == 1 the n axis is kept (the fleet update is
        always the fused scan)."""
        assert self.num_eps > 0, 'Cannot sample: some seed has no episodes'
        self._draws += 1
        n_filled = np.minimum(self._num_eps, self._capacity_eps).astype(np.int32)
        return self._sample_jit(self._storage, self._ep_rows, n_filled,
                                np.int32(self._draws), n_batches=n)

    def _sample_device(self, storage, ep_rows, n_filled, draw,
                       n_batches: int = 1):
        T, B = self._horizon, self._batch_size
        NB = B * n_batches
        key = jax.random.fold_in(self._key, draw)
        seed_keys = jax.random.split(key, self.K)

        def draw_one(k, rows_k, filled_k):
            # the exact single-seed draw (slice-uniform episode weighting,
            # torchrl SliceSampler semantics), vmapped over seeds
            return draw_slice_indices(k, rows_k, filled_k, NB, T,
                                      self._capacity_eps)

        ep_idx, start = jax.vmap(draw_one)(seed_keys, ep_rows, n_filled)

        t_obs = jnp.arange(T + 1)[None, None]          # [1, 1, T+1]
        t_act = jnp.arange(1, T + 1)[None, None]       # [1, 1, T]
        rows_obs = start[..., None] + t_obs            # [K, NB, T+1]
        rows_act = start[..., None] + t_act            # [K, NB, T]
        seed_ax = jnp.arange(self.K)[:, None, None]
        ep_b = ep_idx[..., None]

        def gather(leaf, rows):
            return leaf[seed_ax, ep_b, rows]           # [K, NB, T(,...)]

        obs = gather(storage['obs'], rows_obs)
        action = gather(storage['action'], rows_act)
        reward = gather(storage['reward'], rows_act)
        if 'terminated' in storage:
            terminated = gather(storage['terminated'], rows_act)
        else:
            terminated = jnp.zeros_like(reward)

        def layout(x, has_tail):
            # [K, NB, T, ...] -> [K, n, T, B, ...]
            x = jnp.moveaxis(x, 1, 2)                  # [K, T, NB, ...]
            x = x.reshape(x.shape[0], x.shape[1], n_batches, B, *x.shape[3:])
            x = jnp.moveaxis(x, 2, 1)                  # [K, n, T, B, ...]
            return x if has_tail else x[..., None]

        return (layout(obs, True), layout(action, True),
                layout(reward, False), layout(terminated, False), None)
