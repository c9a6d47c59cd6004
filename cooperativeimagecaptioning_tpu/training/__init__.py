"""Training stack: joint loss composition, per-agent optimizers, schedules, loop."""
