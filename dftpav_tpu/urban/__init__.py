"""Urban driving stack: lanes, Frenet transforms, driver models, behavior planning.

TPU-native re-design of the reference's simulation/behavior layer
(reference: src/Sim/core/{common,forward_simulator,behavior_planner,route_planner}
and src/Sim/util/eudm_planner): lanes are fixed-shape sampled arrays, Frenet
transforms are vectorized gathers, driver models (IDM/MOBIL/pure-pursuit) are
pure functions, and multi-agent forward simulation is a `lax.scan` that is
`vmap`-ed over candidate policies (MPDM) or policy-tree leaves (EUDM).
"""

from dftpav_tpu.urban.lane import (  # noqa: F401
    Lane,
    LaneSet,
    build_lane,
    frenet_of_point,
    frenet_of_state,
    lane_point,
    state_of_frenet,
)
