"""Interoperability with the reference torch implementation.

``torch_import`` maps reference checkpoint files (torch state_dicts) onto
our flax param trees so trained models migrate without retraining.
"""

from crowdmod_tpu.compat.torch_import import (  # noqa: F401
    BACKBONE_FOR_ARCH,
    detect_backbone,
    import_torch_checkpoint,
    load_torch_state_dict,
    verify_tree_matches,
)
