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
