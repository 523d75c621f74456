from . import benchapp, matrixtools, scaling, suite, vecdiff  # noqa: F401
