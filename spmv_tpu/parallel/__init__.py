"""Distribution layer (reference L3/L4): partitioning, the compiled halo-
exchange plan (CommPlan = L2GMap), and the sharded distributed matrix."""
