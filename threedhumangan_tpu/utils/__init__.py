from threedhumangan_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
)
from threedhumangan_tpu.utils.debug import (
    assert_shape,
    check_replica_consistency,
    count_params,
    print_module_summary,
    profiled_function,
)
from threedhumangan_tpu.utils.ema import ema_init, ema_update
from threedhumangan_tpu.utils.fid import fid_between, frechet_distance
from threedhumangan_tpu.utils.misc import (
    normalize_2nd_moment,
    normalize_vecs,
    positional_encoding,
    apply_transformation,
    lecun_uniform,
    kaiming_normal_leaky,
    uniform_init,
    Policy,
)
from threedhumangan_tpu.utils.torch_convert import (
    convert_generator_state_dict,
    load_torch_checkpoint,
)
