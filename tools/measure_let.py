"""Price the LET schedule's per-chip step components on ONE real chip.

VERDICT r2 weak #3: the v5e-8 projection for BASELINE config 4 priced
`export_walk` and the import-forest walk without a single TPU
measurement. Everything except the all_to_all itself is measurable on
one chip: this script times, for a chip owning n_local particles of an
N = P * n_local run,

  sort        local Morton sort (the step's prologue)
  build       local octree build
  export      export_walk over P synthetic destination bboxes
              (contiguous Morton-slice bounds of the local set — the
              shape real neighbor chips present)
  import_walk the split LET walk's second half: group walk of the local
              receivers against a P x let_cap import forest assembled
              from real export buffers
  local_walk  the split LET walk's first half (== the single-chip walk)

Run ONE component per fresh process (within-process later jits measure
up to 1.5x slow, CLAUDE.md); each prints one JSON line. Example:

  for c in sort build export import_walk local_walk; do
    python tools/measure_let.py --n-local 4000000 --theta 0.75 \
        --component $c --tag v5e8-proj
  done
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-local", type=int, default=4_000_000)
    ap.add_argument("--p", type=int, default=8)
    ap.add_argument("--theta", type=float, default=0.75)
    ap.add_argument("--init", choices=["uniform", "disc", "spherical"],
                    default="uniform")
    ap.add_argument("--let-cap", type=int, default=16384)
    ap.add_argument(
        "--component",
        choices=[
            "sort", "build", "export", "import_walk", "local_walk",
            "fused_walk", "import_prep", "step_no_a2a",
        ],
        required=True,
        help="fused_walk = ONE group walk over local tree + imports "
        "(round 5; its delta over local_walk is the fused import "
        "overhead, target <= 0.1 s at n_local=4M); import_prep = the "
        "receiver-side compaction + import-octet build alone; "
        "import_walk = the r4 SPLIT walk's second half (let_fused=0); "
        "step_no_a2a = the WHOLE per-chip LET step as ONE jitted fn "
        "(sort + build + export + fused walk + leapfrog) with the "
        "import forest standing in for the all_to_all result — the "
        "VERDICT r4 weak #2 single-process validation of the "
        "component-sum projection",
    )
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tag", type=str, default="")
    ap.add_argument(
        "--geometry", choices=["overlap", "octants"], default="overlap",
        help="destination-bbox geometry. 'overlap' (r2's probe): Morton "
        "slices of the LOCAL set — destinations INSIDE the source "
        "domain, the worst case (nothing near them prunes). 'octants': "
        "the realistic P=8 layout — local particles scaled into octant "
        "[-1,0]^3 of the global cube, destinations = the 7 other "
        "octants; exports prune by real inter-domain distance. Use "
        "octants to size let_cap, overlap to bound the import walk.",
    )
    ap.add_argument(
        "--export-stage", choices=["walk", "payload", "full"],
        default="full",
        help="for --component export: truncate the export at this stage "
        "(walk = DFS loop only, payload = everything but the pruned-skip "
        "searchsorted) to attribute the cap-sized emission cost",
    )
    ap.add_argument(
        "--prune-via-sort", type=int, choices=[0, 1], default=None,
        help="for --component export: override let_tree._PRUNE_VIA_SORT "
        "(1 = rank-join sorts, 0 = vmapped searchsorted) to A/B the "
        "pruned-skip ranking implementation",
    )
    ap.add_argument(
        "--export-fanout", type=int, default=None,
        help="override let_tree._EXPORT_FANOUT (0 = legacy single lane "
        "per destination, 8 = parallel child-subtree lanes) to A/B the "
        "export walk's substep parallelism",
    )
    ap.add_argument(
        "--split-step", action="store_true",
        help="for --component step_no_a2a: run the r4 SPLIT walk inside "
        "the whole-step function (local octet walk + reduced-budget "
        "skip-engine import walk, accelerations added) instead of the "
        "fused walk — the same-session whole-step A/B of tp.let_fused",
    )
    ap.add_argument(
        "--inert-imports", action="store_true",
        help="for --component fused_walk: zero the export row counts "
        "before the receiver-side prep, so the import octet tables are "
        "appended at full static size (cap_forest rows) but hold no "
        "content and seed no roots — isolates the fused walk's "
        "TABLE-SIZE cost (every phase-A chained gather reads the "
        "concatenated table; the cost law scales with table size) from "
        "its real import-row traversal",
    )
    ap.add_argument(
        "--forest-factor", type=float, default=None,
        help="override TreeParams.let_forest_factor (static cap of the "
        "fused walk's compacted import forest, in let_caps; default "
        "4.0) to A/B the concatenated-table-size cost",
    )
    ap.add_argument(
        "--import-tile", type=int, default=None,
        help="override walk_tile for the SPLIT import walk only "
        "(import_walk component and --split-step): the import forest is "
        "shallow, so wider tiles cut the group-walk machinery's "
        "per-tile fixed costs at the price of per-tile list pressure",
    )
    ap.add_argument(
        "--import-list-cap", type=int, default=None,
        help="override TreeParams.let_import_list_cap for the "
        "import_walk component (default: the auto resolution, i.e. "
        "exactly what sharded_tree's split walk uses); pass the full "
        "walk_list_cap (8192) to reproduce the r2 full-budget number",
    )
    args = ap.parse_args()

    cache = os.path.expanduser("~/.cache/wgpu_n_body_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from wgpu_n_body_tpu import inits
    from wgpu_n_body_tpu.ops.import_octets import build_import_octets
    from wgpu_n_body_tpu.ops.tree_build import build_tree, morton_sort
    from wgpu_n_body_tpu.ops.tree_walk_group import group_tree_forces
    from wgpu_n_body_tpu.parallel.let_tree import (
        assemble_import_forest,
        compact_import_forest,
        export_walk,
    )
    from wgpu_n_body_tpu.params import SimParams, TreeParams
    from wgpu_n_body_tpu.utils.profiling import hard_sync

    init_fn = {
        "uniform": inits.uniform_init,
        "disc": inits.disc_init,
        "spherical": inits.spherical_init,
    }[args.init]
    n, p = args.n_local, args.p
    sp = SimParams(particle_num=n, g=1e-6, dt=0.016)
    tp = TreeParams(theta=args.theta)
    if args.forest_factor is not None:
        import dataclasses as _dc

        tp = _dc.replace(tp, let_forest_factor=args.forest_factor)
    state = init_fn(jax.random.key(0), sp)
    if args.geometry == "octants":
        # this chip owns octant 0 of the global [-1,1]^3 cube
        state = state._replace(pos=state.pos * 0.5 - 0.5)

    # prologue products every component needs (computed once, unjitted
    # timing-wise irrelevant here; the timed fn is jitted below)
    sort_j = jax.jit(lambda st: morton_sort(st, tp.max_depth))
    ss, bound, keys = sort_j(state)
    build_j = jax.jit(lambda s, k, b: build_tree(s, k, b, tp))
    tree = build_j(ss, keys, bound)

    if args.geometry == "octants":
        # destination d = octant d of the global cube (self = octant 0);
        # disjoint domains, real inter-chip pruning distances
        lo = jnp.array(
            [
                [-1.0 + (d & 1), -1.0 + ((d >> 1) & 1), -1.0 + ((d >> 2) & 1)]
                for d in range(p)
            ],
            jnp.float32,
        )
        blo, bhi = lo, lo + 1.0
    else:
        # synthetic destination bboxes: P contiguous Morton slices of the
        # local sorted set (what compact neighbor ownership looks like)
        nl = n // p
        blo = jnp.stack(
            [ss.pos[i * nl : (i + 1) * nl].min(axis=0) for i in range(p)]
        )
        bhi = jnp.stack(
            [ss.pos[i * nl : (i + 1) * nl].max(axis=0) for i in range(p)]
        )

    if args.component == "sort":
        fn = lambda: sort_j(state)[0].pos
    elif args.component == "build":
        fn = lambda: build_j(ss, keys, bound).nodes_f32
    elif args.component == "export":
        if args.prune_via_sort is not None or args.export_fanout is not None:
            import wgpu_n_body_tpu.parallel.let_tree as _lt

            if args.prune_via_sort is not None:
                _lt._PRUNE_VIA_SORT = bool(args.prune_via_sort)
            if args.export_fanout is not None:
                _lt._EXPORT_FANOUT = args.export_fanout
        exp_j = jax.jit(
            lambda t, pos, mass: export_walk(
                t, pos, mass, blo, bhi, jnp.int32(0), tp.theta,
                args.let_cap, stage=args.export_stage,
            )
        )
        _e = exp_j(tree, ss.pos, ss.mass)
        rows = [int(x) for x in _e.n_rows]
        ovf = [bool(x) for x in _e.overflow]
        fn = lambda: exp_j(tree, ss.pos, ss.mass)
    elif args.component == "import_walk":
        import dataclasses

        exp = export_walk(
            tree, ss.pos, ss.mass, blo, bhi, jnp.int32(0), tp.theta,
            args.let_cap,
        )
        if args.geometry == "octants":
            # By symmetry of the uniform scene, the buffer chip d SENDS us
            # is statistically the buffer WE export to chip d, translated
            # from our octant into theirs — so translating our own exports
            # by the octant offsets yields a realistic import forest
            # (rows far from the receivers, pruned by true inter-domain
            # distance) without 8 real chips. Zero-mass tail rows
            # contribute nothing wherever they land.
            delta = blo - blo[0:1]  # (P, 3) octant offsets
            exp = exp._replace(
                nodes=exp.nodes.at[:, :, :3].add(delta[:, None, :]),
                parts=exp.parts.at[:, :, :3].add(delta[:, None, :]),
            )
        rows = [int(x) for x in exp.n_rows]
        ovf = [bool(x) for x in exp.overflow]
        # the same reduced budget sharded_tree's split walk applies
        tp_imp = dataclasses.replace(
            tp,
            walk_list_cap=(
                args.import_list_cap
                if args.import_list_cap is not None
                else tp.effective_import_list_cap()
            ),
            **(
                {"walk_tile": args.import_tile}
                if args.import_tile is not None
                else {}
            ),
        )

        def imp_walk(pos_new, parts, imp_local):
            forest = assemble_import_forest(imp_local)
            acc, stats = group_tree_forces(
                pos_new,
                parts[:, :, :3].reshape(-1, 3),
                parts[:, :, 3].reshape(-1),
                forest,
                keys,
                sp,
                tp_imp,
                gid_offset=p * args.let_cap,
            )
            return acc, stats.deferred

        imp_j = jax.jit(imp_walk)
        fn = lambda: imp_j(ss.pos, exp.parts, exp)[0]
        deferred = int(imp_j(ss.pos, exp.parts, exp)[1])
    elif args.component in ("fused_walk", "import_prep"):
        import jax.numpy as _jnp

        exp = export_walk(
            tree, ss.pos, ss.mass, blo, bhi, jnp.int32(0), tp.theta,
            args.let_cap,
        )
        if args.geometry == "octants":
            delta = blo - blo[0:1]
            exp = exp._replace(
                nodes=exp.nodes.at[:, :, :3].add(delta[:, None, :]),
                parts=exp.parts.at[:, :, :3].add(delta[:, None, :]),
            )
        rows = [int(x) for x in exp.n_rows]
        ovf = [bool(x) for x in exp.overflow]
        if args.inert_imports:
            exp = exp._replace(n_rows=jnp.zeros_like(exp.n_rows))
        cap_forest = tp.let_forest_cap(p, args.let_cap)
        part_base = n + 1

        def prep(imp_local):
            bundle = compact_import_forest(imp_local, cap_forest, part_base)
            return build_import_octets(
                bundle.forest, bundle.roots, bundle.extents,
                tree.root_width, tp.max_depth, part_base,
            ), bundle

        if args.component == "import_prep":
            prep_j = jax.jit(lambda il: prep(il)[0].octets)
            fn = lambda: prep_j(exp)
        else:

            def fused(pos_new, pos, mass, t, imp_local):
                iset, bundle = prep(imp_local)
                src_pos = _jnp.concatenate(
                    [pos, _jnp.full((1, 3), 1e15, _jnp.float32),
                     bundle.parts[:, :3]]
                )
                src_mass = _jnp.concatenate(
                    [mass, _jnp.zeros((1,), _jnp.float32),
                     bundle.parts[:, 3]]
                )
                acc, stats = group_tree_forces(
                    pos_new, src_pos, src_mass, t, keys, sp, tp,
                    imports=iset,
                )
                return acc, stats.deferred

            fused_j = jax.jit(fused)
            fn = lambda: fused_j(ss.pos, ss.pos, ss.mass, tree, exp)[0]
            deferred = int(fused_j(ss.pos, ss.pos, ss.mass, tree, exp)[1])
    elif args.component == "step_no_a2a":
        # One jitted function covering everything a chip does per LET
        # step EXCEPT the all_to_all (its ~28 MB/chip of ICI traffic is
        # the only part one chip cannot run): local Morton sort, build,
        # export walk toward the P destination bboxes, the fused
        # local+import walk, and the leapfrog update. The import forest
        # reuses the chip's own (translated, --geometry octants)
        # exports, which is exactly the statistical stand-in the
        # component pricing uses. Interference effects (VMEM pressure,
        # scheduler overlap) that a fresh-process component SUM cannot
        # see are all present here.
        import jax.numpy as _jnp

        exp0 = export_walk(
            tree, ss.pos, ss.mass, blo, bhi, jnp.int32(0), tp.theta,
            args.let_cap,
        )
        delta = (
            blo - blo[0:1]
            if args.geometry == "octants"
            else jnp.zeros_like(blo)
        )
        rows = [int(x) for x in exp0.n_rows]
        ovf = [bool(x) for x in exp0.overflow]
        cap_forest = tp.let_forest_cap(p, args.let_cap)

        def one_step(st_in):
            half = sp.dt / 2.0
            vel_h = st_in.vel + st_in.acc * half
            ss2, bound2, keys2 = morton_sort(
                st_in._replace(vel=vel_h), tp.max_depth
            )
            tree2 = build_tree(ss2, keys2, bound2, tp)
            pos_new = ss2.pos + ss2.vel * sp.dt
            exp = export_walk(
                tree2, ss2.pos, ss2.mass, blo, bhi, jnp.int32(0),
                tp.theta, args.let_cap,
            )
            imp = exp._replace(
                nodes=exp.nodes.at[:, :, :3].add(delta[:, None, :]),
                parts=exp.parts.at[:, :, :3].add(delta[:, None, :]),
            )
            n_local = ss2.pos.shape[0]
            part_base = n_local + 1
            if args.split_step:
                import dataclasses as _dc

                acc_loc, s1 = group_tree_forces(
                    pos_new, ss2.pos, ss2.mass, tree2, keys2, sp, tp
                )
                forest = assemble_import_forest(imp)
                tp_imp = _dc.replace(
                    tp,
                    walk_list_cap=(
                        args.import_list_cap
                        if args.import_list_cap is not None
                        else tp.effective_import_list_cap()
                    ),
                    **(
                        {"walk_tile": args.import_tile}
                        if args.import_tile is not None
                        else {}
                    ),
                )
                acc_imp, s2 = group_tree_forces(
                    pos_new,
                    imp.parts[:, :, :3].reshape(-1, 3),
                    imp.parts[:, :, 3].reshape(-1),
                    forest,
                    keys2,
                    sp,
                    tp_imp,
                    gid_offset=p * args.let_cap,
                )
                acc_new = acc_loc + acc_imp
                stats_deferred = s1.deferred + s2.deferred
            else:
                bundle = compact_import_forest(imp, cap_forest, part_base)
                iset = build_import_octets(
                    bundle.forest, bundle.roots, bundle.extents,
                    tree2.root_width, tp.max_depth, part_base,
                )
                src_pos = _jnp.concatenate(
                    [ss2.pos, _jnp.full((1, 3), 1e15, _jnp.float32),
                     bundle.parts[:, :3]]
                )
                src_mass = _jnp.concatenate(
                    [ss2.mass, _jnp.zeros((1,), _jnp.float32),
                     bundle.parts[:, 3]]
                )
                acc_new, stats = group_tree_forces(
                    pos_new, src_pos, src_mass, tree2, keys2, sp, tp,
                    imports=iset,
                )
                stats_deferred = stats.deferred
            vel_new = ss2.vel + acc_new * half
            return st_in._replace(
                pos=pos_new, vel=vel_new, acc=acc_new, mass=ss2.mass
            ), stats_deferred

        step_j = jax.jit(one_step, donate_argnums=(0,))
        cur = {"st": state, "deferred": None}

        def fn():
            out, d = step_j(cur["st"])
            cur["st"] = out
            cur["deferred"] = d
            return out.pos

        deferred = None
    else:  # local_walk
        walk_j = jax.jit(
            lambda pos_new, pos, mass, t: group_tree_forces(
                pos_new, pos, mass, t, keys, sp, tp
            )[0]
        )
        fn = lambda: walk_j(ss.pos, ss.pos, ss.mass, tree)

    out = fn()  # compile + warmup
    hard_sync(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = fn()
        hard_sync(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)

    rec = {
        "tag": args.tag,
        "component": args.component,
        "n_local": n,
        "p": p,
        "theta": args.theta,
        "init": args.init,
        "let_cap": args.let_cap,
        "min_s": min(times),
        "all_s": [round(t, 4) for t in times],
        "backend": jax.default_backend(),
    }
    rec["geometry"] = args.geometry
    if args.inert_imports:
        rec["inert_imports"] = True
    if args.split_step:
        rec["split_step"] = True
    if args.component == "step_no_a2a":
        if cur.get("deferred") is not None:
            rec["walk_deferred"] = int(cur["deferred"])
        if args.import_list_cap is not None:
            rec["import_list_cap"] = args.import_list_cap
    if args.forest_factor is not None:
        rec["forest_factor"] = args.forest_factor
    if args.component in ("export", "import_walk", "fused_walk", "import_prep", "step_no_a2a"):
        rec["export_rows"] = rows
        rec["export_overflow"] = ovf
    if args.component == "fused_walk":
        rec["walk_deferred"] = deferred
    if args.component == "export":
        rec["export_stage"] = args.export_stage
        if args.prune_via_sort is not None:
            rec["prune_via_sort"] = bool(args.prune_via_sort)
        if args.export_fanout is not None:
            rec["export_fanout"] = args.export_fanout
    if args.component == "import_walk":
        rec["import_list_cap"] = tp_imp.walk_list_cap
        rec["walk_deferred"] = deferred
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
