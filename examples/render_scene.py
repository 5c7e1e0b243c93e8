"""Render a scene to PNG frames (the testbed-plugin analog, headless).

Usage::

    python examples/render_scene.py basic3 --steps 100 --every 10 --out /tmp/frames
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from salva_tpu import scenes as scn
    from salva_tpu.viz import RenderOptions, render_frame

    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--out", default="/tmp/salva_frames")
    ap.add_argument("--mode", default="velocity",
                    choices=["static", "velocity", "arrows"])
    ap.add_argument("--boundaries", action="store_true")
    args = ap.parse_args()

    if args.scene not in scn.SCENES:
        print(f"unknown scene {args.scene!r}", file=sys.stderr)
        sys.exit(2)
    os.makedirs(args.out, exist_ok=True)
    scene = scn.SCENES[args.scene]()
    opt = RenderOptions(
        mode=args.mode, render_boundary_particles=args.boundaries
    )

    for i in range(args.steps):
        if scene.callback is not None:
            scene.callback(scene, i, i * scene.dt)
        scene.step()
        if (i + 1) % args.every == 0:
            path = os.path.join(args.out, f"{args.scene}_{i + 1:05d}.png")
            render_frame(scene.world, path, opt,
                         title=f"{args.scene} step {i + 1}")
            print(path)


if __name__ == "__main__":
    main()
