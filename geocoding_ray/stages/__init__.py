"""Ray Data batch transforms: stateless task fns and actor-pool classes."""
