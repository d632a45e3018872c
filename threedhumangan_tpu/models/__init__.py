"""Model zoo: neural field, mapping nets, synthesis stack, generator, D.

Mirrors reference layers L2/L3 (SURVEY.md §1): lib/implicit_funcitions,
lib/generators, lib/discriminators, lib/components/{map3d,pigan}_layers.
"""

from threedhumangan_tpu.models import smpl, synthesis, volume_rendering
from threedhumangan_tpu.models.discriminator import (
    discriminator_forward,
    init_discriminator,
)
from threedhumangan_tpu.models.generator import (
    generate_avg_latent,
    generator_forward,
    init_generator,
    render,
    staged_forward,
)
from threedhumangan_tpu.models.mapping import (
    apply_mapping_network,
    apply_two_part_mapping_network,
    init_mapping_network,
    init_two_part_mapping_network,
)
from threedhumangan_tpu.models.siren import (
    NEURAL_FIELD_REGISTRY,
    apply_coordconcat_siren,
    init_coordconcat_siren,
)
