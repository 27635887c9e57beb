#!/usr/bin/env python
"""Generate the full Run2.ipynb sweep surface as runnable scripts.

The reference ships 41 runnable command cells in Run2.ipynb (two of them
seed-sweep loops, expanding to 55 concrete commands). The flag-sets are
recorded verbatim in `run2_manifest.json` (extracted from
/root/reference/Run2.ipynb; each entry cites its source cell) and this
generator writes one runnable script per command under `recipes/sweep/`,
with `python Main.py` mapped to `python -m mimrl_tpu.cli.main`.

Every generated flag-set parses into a valid MimrlConfig
(tests/test_sweep_surface.py asserts this for all 55).

Usage:  python recipes/generate_sweep.py [--outdir recipes/sweep]
"""

from __future__ import annotations

import argparse
import json
import os
import stat

HERE = os.path.dirname(os.path.abspath(__file__))

HEADER = """#!/usr/bin/env bash
# Run2.ipynb cell {cell} — {task_name} (flag-set verbatim from the
# reference notebook; extracted by recipes/generate_sweep.py).
# Usage: {script} [extra flags...]  (e.g. --data_dir, --bert_vocab)
set -euo pipefail

"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=os.path.join(HERE, "sweep"))
    ap.add_argument("--manifest",
                    default=os.path.join(HERE, "run2_manifest.json"))
    args = ap.parse_args()

    cmds = json.load(open(args.manifest))
    os.makedirs(args.outdir, exist_ok=True)
    written = []
    for idx, entry in enumerate(cmds):
        cmd = entry["cmd"]
        assert cmd.startswith("python Main.py "), cmd
        flags = cmd[len("python Main.py "):].strip()
        task_name = "run"
        toks = flags.split()
        if "--task_name" in toks:
            task_name = toks[toks.index("--task_name") + 1]
        script = f"{idx:02d}_cell{entry['cell']:02d}_{task_name}.sh"
        path = os.path.join(args.outdir, script)
        body = HEADER.format(cell=entry["cell"], task_name=task_name,
                             script=f"recipes/sweep/{script}")
        body += ("python -m mimrl_tpu.cli.main \\\n  "
                 + flags.replace(" --", " \\\n  --") + ' \\\n  "$@"\n')
        with open(path, "w") as f:
            f.write(body)
        os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
        written.append(script)
    print(f"wrote {len(written)} scripts to {args.outdir}")


if __name__ == "__main__":
    main()
