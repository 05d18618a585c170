from liwslam.core import geometry  # noqa: F401
