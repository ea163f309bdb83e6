"""psum/backward overlap evidence (VERDICT r4 item 3, BASELINE config 5).

AOT-compiles the 8-device sharded train step for a REAL v5e:2x4 TPU
topology (jax.experimental.topologies — compile-only, no chips needed)
and analyzes the final *scheduled* HLO module (is_scheduled=true, so
printed instruction order == execution order) to answer: where do the
gradient all-reduces sit relative to backward compute?

Run: python bench/overlap_probe.py   (writes bench/overlap_hlo_excerpt.txt)
Findings + arithmetic: bench/OVERLAP.md. Regression: tests/test_overlap_schedule.py.
"""

from __future__ import annotations

import re


def build_train_step(size=512, data=4, model=2):
    """The sharded train step + abstract (sharding-annotated) args for a
    v5e:{data}x{model} topology. Returns (train_step, abstract_args)."""
    import numpy as np

    import jax

    # Concrete example values are built on CPU; compilation is AOT
    # against the abstract TPU topology (never attaches the device
    # tunnel — safe to run alongside a TPU job).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from raytpu.core.cornell import cornell_box
    from raytpu.core.types import Camera, Lights, RenderConfig
    from raytpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from raytpu.parallel.render import TrainState, make_sharded_train_step

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=f"v5e:{data}x{model}"
    )
    devs = np.array(topo.devices).reshape(data, model)
    mesh = Mesh(devs, (DATA_AXIS, MODEL_AXIS))

    cfg = RenderConfig(width=size, height=size, mode="clean",
                       use_pallas=False)
    scene = cornell_box(pad_to=32)
    camera = Camera.raytracer_default()
    lights = Lights.single(capacity=1)
    opt = optax.adam(1e-2)
    train_step, _ = make_sharded_train_step(mesh, cfg, opt)
    state = TrainState(scene=scene, lights=lights,
                       opt_state=opt.init((scene, lights)))
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(DATA_AXIS, None, None))

    def sds(x, sh):
        return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x),
                                    sharding=sh)

    a_state = jax.tree.map(lambda x: sds(x, rep), state)
    a_cam = jax.tree.map(lambda x: sds(x, rep), camera)
    a_tgt = sds(target, row)
    return train_step, (a_state, a_cam, a_tgt)


def compile_scheduled_hlo(size=512):
    """Scheduled v5e HLO text of the sharded train step."""
    train_step, args = build_train_step(size=size)
    return train_step.lower(*args).compile().as_text()


def analyze(txt):
    """Schedule facts about every collective in the entry computation.

    Returns a dict: for each collective, its scheduled index, its
    producers' indices, its consumers' indices, and the number of
    instructions between issue and first/last consumption (the schedule
    window the op can execute under).
    """
    lines = txt.splitlines()
    entry = next(i for i, l in enumerate(lines) if l.startswith("ENTRY"))
    body = lines[entry:]

    defs = {}  # name -> index within body
    for i, l in enumerate(body):
        m = re.match(r"\s*%(\S+) = ", l)
        if m:
            defs[m.group(1)] = i

    out = {"is_scheduled": "is_scheduled=true" in txt, "collectives": {}}
    for name, i in defs.items():
        if not re.match(r"(all-reduce|all-gather|psum|collective-permute|"
                        r"reduce-scatter)", name):
            continue
        line = body[i]
        # Producers: operand names inside the op's argument list (the
        # type annotation may itself be a tuple, so anchor on the opcode
        # immediately before the operand parens).
        m = re.search(
            r"(?:all-reduce|all-gather|collective-permute|"
            r"reduce-scatter)\((.*?)\), (?:channel_id|dimensions|"
            r"source_target_pairs)", line)
        ops = re.findall(r"%([\w.\-]+)", m.group(1)) if m else []
        prod = sorted(defs[o] for o in ops if o in defs)
        cons = []
        for j in range(i + 1, len(body)):
            if re.search(rf"[(,\s]%{re.escape(name)}[),\s]", body[j]):
                cons.append(j)
        out["collectives"][name] = {
            "index": i,
            "producers": prod,
            "consumers": cons[:8],
            "gap_after_last_producer": (i - prod[-1]) if prod else None,
            "window_to_first_consumer": (cons[0] - i) if cons else None,
            "window_to_last_consumer": (cons[-1] - i) if cons else None,
            "n_operands": len(ops),
            "grad_psum": "transpose(jvp())/shard_map/psum" in line,
            "replica_groups": re.search(r"replica_groups=\{(.*?)\}\}",
                                        line).group(1)
            if "replica_groups" in line else "",
        }
    out["n_instructions"] = len(body)
    return out


def main():
    import json
    import os

    txt = compile_scheduled_hlo(size=512)
    facts = analyze(txt)
    here = os.path.dirname(os.path.abspath(__file__))
    # Commit only the collective lines (the full module is ~550 KB).
    excerpt = [l for l in txt.splitlines()
               if re.search(r"%(all-reduce|all-gather|psum)", l)
               and " = " in l]
    with open(os.path.join(here, "overlap_hlo_excerpt.txt"), "w") as f:
        f.write("\n".join(excerpt) + "\n")
    print(json.dumps(facts, indent=2))


if __name__ == "__main__":
    main()
