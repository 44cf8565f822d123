"""Stand a trained world model behind the HTTP inference server.

Usage:
    python scripts/serve.py --config configs/mopoe_mrssm.yaml \
        --checkpoint runs/x/checkpoints [--host 0.0.0.0] [--port 8000]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from multimodal_mtrssm_tpu.server import InferenceServer  # noqa: E402
from multimodal_mtrssm_tpu.serving import WorldModel  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True, help="checkpoints dir of a run")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--use-pallas", default="auto", choices=["auto", "true", "false"])
    ap.add_argument("--mesh", action="store_true",
                    help="batch-parallel serving over all devices (data mesh)")
    args = ap.parse_args()

    use_pallas = {"auto": "auto", "true": True, "false": False}[args.use_pallas]
    mesh = None
    if args.mesh:
        from multimodal_mtrssm_tpu.parallel import make_mesh

        mesh = make_mesh()
    wm = WorldModel.from_checkpoint(args.config, args.checkpoint,
                                    use_pallas=use_pallas, mesh=mesh)
    server = InferenceServer(wm, host=args.host, port=args.port)
    print(f"serving {type(wm.model).__name__} on http://{args.host}:{server.port} "
          "(/healthz /observe /imagine)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()
