"""One-off: print per-step rebuild/dirty diagnostics at scale on TPU."""
import sys
sys.path.insert(0, ".")
import numpy as np
import argon_monte_carlo_tpu as amc

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
eng = amc.EngineConfig(dtype="float32", broadphase="cells",
                       steps_per_epoch=16, narrowphase="pairs",
                       rebuild_interval=8)
cfg = amc.temperature_pore_config(engine=eng).scaled_to(N)
sim = amc.Simulation(amc.make_workload(cfg))
st, m, met = sim.run(num_steps=16)
print("rebuilt:", np.asarray(met.rebuilt))
print("dirty:  ", np.asarray(met.dirty_count))
print("colls:  ", np.asarray(met.collisions))
print("wall_hits:", np.asarray(met.wall_hits))
print("oob_w:", np.asarray(met.oob_after_walls))
print("overflow:", int(m.overflow_count), "hist_drop:", int(m.hist_drop_count))
