"""Top-level materials module (parity with `import meep.materials`):
re-exports the fitted optical-material library."""

from .models.materials import *            # noqa: F401,F403
from .models.materials import (MATERIAL_LIBRARY, epsilon_of)  # noqa: F401
