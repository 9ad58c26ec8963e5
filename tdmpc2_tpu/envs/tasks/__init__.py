"""Custom dm_control task registrations.

The reference ships 28 custom DMControl tasks across 7 domains plus modified
MuJoCo XMLs (reference: tdmpc2/envs/tasks/*). Importing this package registers
ours into `dm_control.suite` under the 'custom' tag so `suite.load` finds
them; the registration is idempotent.

Currently registered: (populated incrementally — see tasks/*.py modules).
"""

_REGISTERED = False


def register_all():
    global _REGISTERED
    if _REGISTERED:
        return
    try:
        from dm_control import suite
    except Exception:  # dm_control unavailable: nothing to register
        return
    # Import task modules for their @SUITE.add side effects.
    # (custom domains are added here as they are implemented)
    custom = suite._get_tasks('custom')
    new = [t for t in custom if t not in suite.ALL_TASKS]
    suite.ALL_TASKS = suite.ALL_TASKS + tuple(new) if isinstance(
        suite.ALL_TASKS, tuple) else suite.ALL_TASKS + new
    suite.TASKS_BY_DOMAIN = suite._get_tasks_by_domain(suite.ALL_TASKS)
    _REGISTERED = True


register_all()
