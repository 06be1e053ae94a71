from diagan_tpu.train.state import NetState, create_net_state
from diagan_tpu.train.trainer import LogTrainer

__all__ = ["NetState", "create_net_state", "LogTrainer"]
