"""Application solvers (analogs of the reference sim_NSE / sim_2D drivers)."""
