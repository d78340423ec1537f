"""Shared helpers for the CLI entry points."""


def str2bool(v):
    """Canonical truthy-string parser shared by every CLI (the reference's
    equivalent flags are raw strings and therefore always truthy — a
    documented reference bug we do not replicate)."""
    return str(v).lower() in ("1", "true", "yes")


_str2bool = str2bool  # backwards-compat alias


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
