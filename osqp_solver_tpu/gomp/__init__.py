from . import builder, constraints, geometry, layout, trajectory  # noqa: F401
