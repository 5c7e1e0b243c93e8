"""Headless scene runner — the harness analog of the reference's
``all_examples2``/``all_examples3`` launchers + ``FluidsHarnessPlugin``
(``examples3d/all_examples3.rs``, ``harness_plugin.rs:42-75``).

Usage::

    python examples/run_scene.py basic3 --steps 200
    python examples/run_scene.py --list
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from salva_tpu import scenes as scn

    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", help="scene name")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--profile", action="store_true",
                    help="enable per-stage counters")
    args = ap.parse_args()

    if args.list or not args.scene:
        print("\n".join(sorted(scn.SCENES)))
        return

    if args.scene not in scn.SCENES:
        print(f"unknown scene {args.scene!r}; available:", file=sys.stderr)
        print("\n".join(sorted(scn.SCENES)), file=sys.stderr)
        sys.exit(2)
    scene = scn.SCENES[args.scene]()
    if args.profile:
        scene.world.counters.enable()

    t0 = time.perf_counter()
    for i in range(args.steps):
        if scene.callback is not None:
            scene.callback(scene, i, i * scene.dt)
        scene.step()
        if (i + 1) % 50 == 0 or i == 0:
            d = scene.world.last_diagnostics
            n = sum(
                len(scene.world.fluid_positions(h))
                for h in scene.fluid_handles
            )
            print(
                f"step {i + 1:5d}  particles={n}  "
                f"pressure_iters={int(d.solver.pressure_iters)}  "
                f"density_err={float(d.solver.pressure_error):.4f}"
            )
    dt_wall = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt_wall:.2f}s "
          f"({dt_wall / args.steps * 1e3:.1f} ms/step)")
    if args.profile:
        print(scene.world.counters)


if __name__ == "__main__":
    main()
