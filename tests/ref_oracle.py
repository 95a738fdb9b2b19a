"""Load the reference implementation (read-only, /root/reference) as a
numeric ORACLE for parity tests.

Only the pure-Python + scipy modules are imported (signal_data,
signal_processor, roi, model, profiler); mediapipe/cv2-dependent stages are
never constructed.  This follows SURVEY.md §4: "the reference itself ...
becomes the oracle".  No reference code is copied into the framework.
"""

import sys

REFERENCE_PATH = "/root/reference"

if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

import signal_data as ref_signal_data  # noqa: E402,F401
import signal_processor as ref_signal_processor  # noqa: E402,F401
import roi as ref_roi  # noqa: E402,F401


def make_ref_signal(x, y, maxlen=None):
    s = ref_signal_data.Signal(list(x), list(y), maxlen or len(x))
    return s
