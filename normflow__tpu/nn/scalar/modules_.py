"""Parity shim for /root/reference/src/nn/scalar/modules_.py."""

from ...models.elementwise import (
    Identity as Identity_,
    Clone as Clone_,
    Scale as ScaleNet_,
    Tanh as Tanh_,
    ArcTanh as ArcTanh_,
    Expit as Expit_,
    Logit as Logit_,
    Pade11 as Pade11_,
    Pade22 as Pade22_,
    Pade32 as Pade32_,
    SplineFlow as SplineNet_,
    UnityDistConvertor as UnityDistConvertor_,
    PhaseDistConvertor as PhaseDistConvertor_,
    DistConvertor as DistConvertor_,
    SgnBias as SgnBiasNet_,
)
