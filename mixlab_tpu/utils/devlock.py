"""Process-wide serialization of device (PJRT) API calls.

The reference has no analogue — its realtime thread owns all DSP and the
codec threads are pure CPU (``src/module/monitor.rs:185-251``).  Here the
codec/decode threads also use the accelerator (int8 MXU scaling, RGB<->YUV,
plane fetches), and the tunneled single-chip PJRT client used on this
deployment wedges permanently under concurrent multi-thread use: a device
fetch issued while another thread dispatches can simply never complete
(observed live: engine `__array__` stuck forever minutes into a session).

On a single chip there is nothing to gain from concurrent client calls —
XLA queues them anyway — so every device touch from every thread takes
this RLock.  Critical sections are kept tight (one dispatch or one fetch);
an RLock so nested sections (engine tick -> video mixer -> scale) are fine.
"""

import threading

DEVICE_LOCK = threading.RLock()
