"""Reward engines for self-critical sequence training."""
