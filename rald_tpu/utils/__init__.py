from rald_tpu.utils.concurrent import AsyncWorkerPool, imap_tqdm, shell_cmd, thread_map
from rald_tpu.utils.interpolate import interp_pose

__all__ = ["AsyncWorkerPool", "imap_tqdm", "interp_pose", "shell_cmd", "thread_map"]
