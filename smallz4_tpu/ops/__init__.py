from ..utils import jaxcfg  # noqa: F401  (persistent compile cache first)
