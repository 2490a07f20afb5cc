"""Test fixture: simulate the axon-pool outage's hang mode.

Injected via PYTHONPATH by ``test_bench_outage.py``. Only the probe
subprocess (``python -c "import jax; ..."``, argv[0] == "-c") is made
to hang; the outer bench.py process is untouched. The sleep is far
longer than any probe timeout so the subprocess.TimeoutExpired path in
``bench._probe_backend`` is the only way out.
"""
import sys

if sys.argv and sys.argv[0] == "-c":
    import time
    time.sleep(600)
