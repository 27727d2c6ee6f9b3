"""Query operators.  Each module registers its queries with
``plans.registry.register`` so the driver contract (__spark_entry__.py)
can enumerate them."""
