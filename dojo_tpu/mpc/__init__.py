"""Contact-MPC / trajectory optimization layer (the north-star addition over
the reference: thousands of batched MPC solves per chip, scaled over meshes).

The reference demonstrates control via examples (examples/control/*.jl —
LQR on cartpole, MPC via external packages); here trajectory optimization is
a first-class, jit/vmap-native subsystem built on the IFT-differentiable
step."""

from .ilqr import (
    ILQRConfig,
    QuadCost,
    RTIState,
    make_ilqr,
    make_ilqr_rt,
    make_mpc_controller,
    make_mpc_rt,
    make_rti_mpc,
    make_rti_rt,
)
from .trot import (
    TrotGains,
    TrotSpec,
    actuated_indices,
    make_trot_mpc,
    make_trot_rt,
    make_trot_rt2,
    make_trot_rti,
    trot_gains,
    trot_reference,
    trot_spring_params,
    trot_weight_schedule,
)
