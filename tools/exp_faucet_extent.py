"""Probe faucet3's steady-state fluid extent: is the splash corridor
thin in x/z? If yes, a reserved fitted window (thin x/z, full y) cuts
the dense grid ~9x for every pass. Runs the scene's real physics on
the current platform and prints the running alive-extent every 50
steps plus the terminal per-axis max.

Usage: JAX_PLATFORMS=cpu python tools/exp_faucet_extent.py [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salva_tpu import scenes


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    sc = scenes.faucet3()
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for i in range(steps):
        if sc.callback is not None:
            sc.callback(sc, i, i * sc.dt)
        sc.step()
        st = sc.world.fluids_state
        alive = np.asarray(st.alive)
        if not alive.any():
            continue
        pos = np.asarray(st.positions)[alive]
        lo = np.minimum(lo, pos.min(axis=0))
        hi = np.maximum(hi, pos.max(axis=0))
        if (i + 1) % 50 == 0:
            print(f"step {i+1:4d} alive={int(alive.sum()):4d} "
                  f"lo={np.round(lo, 3)} hi={np.round(hi, 3)}", flush=True)
    print("terminal extent:", np.round(lo, 3), np.round(hi, 3))
    h = sc.world.sim.h
    dims = np.ceil((hi - lo) / h).astype(int) + 1 + 8
    print(f"h={h}  fitted dims ~= {dims}  cells={int(np.prod(dims))} "
          f"(full domain grid = 48*64*48 = 147456)")


if __name__ == "__main__":
    main()
