from graph_transformer_tpu.train.optim import (
    PlateauStepLR,
    make_optimizer,
    plateau_lr_step,
)
from graph_transformer_tpu.train.sup_trainer import SupTrainer, train_evaluate_sup
from graph_transformer_tpu.train.unsup_trainer import UnsupTrainer, train_evaluate_unsup
from graph_transformer_tpu.train.node_trainer import NodeTrainer, train_evaluate_node
from graph_transformer_tpu.train.evaluate import (
    logistic_regression_probe,
    tenfold_logistic_accuracy,
)

__all__ = [
    "make_optimizer",
    "plateau_lr_step",
    "PlateauStepLR",
    "SupTrainer",
    "train_evaluate_sup",
    "UnsupTrainer",
    "train_evaluate_unsup",
    "NodeTrainer",
    "train_evaluate_node",
    "logistic_regression_probe",
    "tenfold_logistic_accuracy",
]
