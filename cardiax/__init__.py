"""cardiax — TPU-native multimodal cardiac LMA-detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jr-xing/Multimodal-Learning-to-Improve-Cardiac-Late-Mechanical-Activation-Detection-
From-Cine-MR-Images (reference mounted read-only at /root/reference):

    cine MRI myocardium mask sequence
        -> diffeomorphic registration (momentum UNet -> fluid metric -> EPDiff shooting)
        -> displacement fields
        -> DENSE-supervised strain prediction (126 sectors x T frames)
        -> LMA network -> TOS curves / LMA labels -> 3D activation maps.

Everything on the compute path is a single jit-compiled fwd-bwd XLA program,
data-parallel over a `jax.sharding.Mesh`. The runtime around it (config, data
ingest, splits, trainer engine, checkpoints, metrics, plots) mirrors the
reference's capability surface (see /root/repo/SURVEY.md).
"""

__version__ = "0.1.0"
