"""Shared helpers for the CLI entry points."""


def str2bool(v):
    """Canonical truthy-string parser shared by every CLI (the reference's
    equivalent flags are raw strings and therefore always truthy — a
    documented reference bug we do not replicate)."""
    return str(v).lower() in ("1", "true", "yes")


_str2bool = str2bool  # backwards-compat alias


def str2bool_or_auto(v):
    """Tri-state flag parser for --scan_layers: 'auto' | true | false.
    'auto' defers the backend choice to
    models/decoder.py::resolve_scan_layers (unrolled when its compiled
    program is warm in the durable cache, scan-layers cold)."""
    if str(v).strip().lower() == "auto":
        return "auto"
    return str2bool(v)


def add_parallelism_args(p) -> None:
    """The parallelism flag pair shared by the four trainer CLIs (defined
    once so validation/help can't drift between them); wired through
    ``core.mesh.cli_mesh_and_place(mesh_shape, **parallelism_kwargs(args))``.
    """
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel degree: lay the mesh out as "
                        "(data, model) and shard the joint encoder "
                        "Megatron-style over the model axis "
                        "(core/mesh.py::tp_shard).  Requires "
                        "num_attention_heads %% N == 0.  Default 1 = pure "
                        "data parallelism (the reference's only strategy).")
    p.add_argument("--zero1", type=_str2bool, default=False,
                   help="ZeRO-1 optimizer-state sharding: Adam moments "
                        "sharded over the data axis "
                        "(core/mesh.py::zero1_shard); composes with "
                        "--model_parallel")


def parallelism_kwargs(args) -> dict:
    """kwargs for core.mesh.cli_mesh_and_place from parsed args."""
    return dict(model_parallel=max(1, getattr(args, "model_parallel", 1)),
                zero1=getattr(args, "zero1", False))


def sampling_kwargs(args, beam_size: int) -> dict:
    """Validated DecodeSettings kwargs for the sampling flags shared by
    decode_main and serve_main (--do_sample/--temperature/--top_k/--top_p).
    Defined once so the two CLIs can't drift, and validated HERE so a bad
    value fails at startup instead of at first jit trace (e.g. a sampling
    server started with --warmup false would otherwise 500 on every
    request).  Raises ValueError on out-of-range values and on sampling
    knobs given without --do_sample."""
    do_sample = bool(getattr(args, "do_sample", False))
    temperature = float(getattr(args, "temperature", 1.0))
    top_k = int(getattr(args, "top_k", 0))
    top_p = float(getattr(args, "top_p", 1.0))
    if do_sample and beam_size > 1:
        # the reference samples only in its non-beam loop (model.py:1213);
        # fail loudly rather than silently doing deterministic beam search
        raise ValueError("--do_sample requires --beam_size 1 "
                         "(sampling is a greedy-loop mode, model.py:1213)")
    if not do_sample and (temperature != 1.0 or top_k != 0 or top_p != 1.0):
        raise ValueError(
            "--temperature/--top_k/--top_p require --do_sample")
    if temperature <= 0.0:
        raise ValueError(f"--temperature must be > 0, got {temperature}")
    if top_k < 0:
        raise ValueError(f"--top_k must be >= 0, got {top_k}")
    if not 0.0 < top_p <= 1.0:
        raise ValueError(f"--top_p must be in (0, 1], got {top_p}")
    return dict(sample_mode="sample" if do_sample else "greedy",
                temperature=temperature, top_k=top_k, top_p=top_p)
