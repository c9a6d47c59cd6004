"""Compute ops: relaxations, lax.scan decoders, on-device beam search, losses."""
