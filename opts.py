"""CLI flag surface — reference-compatible shim (ref: opts.py).

`import opts; opts.parse_opt()` works exactly like the reference."""

from cooperativeimagecaptioning_tpu.config import parse_opt  # noqa: F401
