from .imputer import RBMImputer, RBMImputerModel
from .rbm import RestrictedBoltzmannMachine

__all__ = ["RBMImputer", "RBMImputerModel", "RestrictedBoltzmannMachine"]
