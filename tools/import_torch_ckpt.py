#!/usr/bin/env python
"""Import a reference torch checkpoint (`.pth`) into this framework.

The reference saves ``{"net": state_dict, "epoch", "time", "scales",
"depth", "name"}`` (``Train_SMT.py:317-343``) and loads the ``net`` key for
inference (``ExtractFeatures.py:35-36``). This CLI maps that state_dict onto
our flax parameter tree and writes a ``.msgpack`` that ``deepmerge_tpu``
loads directly (``infer.driver.load_params`` accepts it as
``checkpoint_path``).

Usage:
  python tools/import_torch_ckpt.py ckpt.pth out.msgpack \
      [--override model.variant=v3] [--override model.depth=6,4,2] ...

Model config defaults to the flagship v3-642; pass --override for others.
The importer validates every leaf and shape against the target config and
fails loudly on any mismatch.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pth", help="reference .pth checkpoint")
    ap.add_argument("out", help="output .msgpack path")
    ap.add_argument(
        "--override", action="append", default=[],
        help="config override, e.g. model.variant=v5 (repeatable)",
    )
    args = ap.parse_args(argv)

    from deepmerge_tpu.compat.torch_import import (
        load_torch_checkpoint,
        save_flax_variables,
    )
    from deepmerge_tpu.config import Config, apply_overrides

    cfg = apply_overrides(Config(), args.override)
    variables = load_torch_checkpoint(args.pth, cfg)
    save_flax_variables(variables, args.out)
    n = sum(x.size for x in _leaves(variables))
    print(f"imported {n:,} parameters -> {args.out} "
          f"(model {cfg.model.name})")
    return 0


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    sys.exit(main())
