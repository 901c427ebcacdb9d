from minidiff_tpu.utils.gradcheck import (  # noqa: F401
    calculate_finite_differences,
    compute_grads,
)
from minidiff_tpu.utils.visualize import draw_tensor_op_graph, to_dot  # noqa: F401
from minidiff_tpu.utils.checkpoint import (  # noqa: F401
    AsyncCheckpointer,
    load_pytree,
    load_train_state,
    save_pytree,
    save_train_state,
)
from minidiff_tpu.utils.metrics import (  # noqa: F401
    MetricsLogger,
    MFUMeter,
    transformer_train_flops,
)
from minidiff_tpu.utils.profile import (  # noqa: F401
    StepTimer,
    annotate,
    profile_fn,
    trace,
)
from minidiff_tpu.utils.export import (  # noqa: F401
    export_decode,
    export_fn,
    load_fn,
)
