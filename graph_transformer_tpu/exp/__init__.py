from graph_transformer_tpu.exp.hpo import optimize, best_arm

__all__ = ["optimize", "best_arm"]
