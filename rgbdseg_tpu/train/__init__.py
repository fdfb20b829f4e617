"""Training/eval harness: arguments, trainer, evaluator, metrics, checkpoints."""
