"""Small version-compat shims shared across the package."""

import numpy as np

# numpy 2 renamed np.trapz -> np.trapezoid (the old name warns and will be
# removed); one shim here instead of a copy in every AUC call site.
trapezoid = getattr(np, "trapezoid", None) or np.trapz
