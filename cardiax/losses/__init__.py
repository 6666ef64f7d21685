from cardiax.losses.calculator import LossCalculator, get_loss_function
from cardiax.losses.registration import (
    lddmm_energy,
    registration_reconstruction_loss,
    gradient_magnitude_loss,
)
from cardiax.losses.metrics import get_average_performance_dict, tos_sector_error

__all__ = [
    "LossCalculator",
    "get_loss_function",
    "lddmm_energy",
    "registration_reconstruction_loss",
    "gradient_magnitude_loss",
    "get_average_performance_dict",
    "tos_sector_error",
]
