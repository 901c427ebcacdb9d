from minidiff_tpu.ops.definitions import *  # noqa: F401,F403
from minidiff_tpu.ops.wrapping import *  # noqa: F401,F403
