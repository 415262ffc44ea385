"""Workload drivers (the reference's L4 runners as thin CLIs over the shared
core): run_nerf, run_dnerf, run_tnerf, run_multires, extract_mesh,
transform_mesh."""
