"""dojo_tpu — TPU-native differentiable contact physics + MPC engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference maximal-coordinate variational-integrator engine (Dojo):
batched fixed-shape Mehrotra interior-point contact solves under jit/vmap,
implicit-function-theorem gradients through contact, a model/environment
zoo, and multi-chip scaling via jax.sharding meshes.
"""

from . import (
    checkpoint,
    envs,
    lie,
    mechanics,
    minimal,
    models,
    mpc,
    parallel,
    urdf,
    visuals,
)
from .gradients import (
    finite_difference_jacobian,
    make_diff_step,
    make_diff_step_minimal,
    make_rollout_linearize_minimal,
    maximal_jacobians,
    maximal_jacobians_attjac,
    minimal_jacobians,
)
from .builder import (
    Body,
    ContactDef,
    JointDef,
    Mechanism,
    box_body,
    build,
    capsule_body,
    combined_body,
    cylinder_body,
    mesh_body,
    pyramid_body,
    reduce_fixed_joints,
    set_floating_base,
    sphere_body,
)
from .contacts import contact_locations, signed_distances
from .core import BodyState, Params, SolverOptions, Topology, REG
from .residual import make_context, make_residual, pad_inputs
from .simulate import StepInfo, Trajectory, make_simulate, make_step
from .solver import SolveResult, make_solver

__version__ = "0.1.0"
