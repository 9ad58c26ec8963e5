from tdmpc2_tpu.trainer.base import Trainer  # noqa: F401
from tdmpc2_tpu.trainer.online import OnlineTrainer  # noqa: F401
from tdmpc2_tpu.trainer.offline import OfflineTrainer  # noqa: F401
from tdmpc2_tpu.trainer.vec_online import VecOnlineTrainer  # noqa: F401
