from ivlnce_tpu.models import (
    checkpoint_io,
    cma,
    instruction_encoder,
    map_encoder,
    nn,
    policy,
    rednet,
    resnet,
    rnn,
)

__all__ = [
    "checkpoint_io",
    "cma",
    "instruction_encoder",
    "map_encoder",
    "nn",
    "policy",
    "rednet",
    "resnet",
    "rnn",
]
