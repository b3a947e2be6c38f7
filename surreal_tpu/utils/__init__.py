from surreal_tpu.utils import guards
from surreal_tpu.utils.logger import get_logger
from surreal_tpu.utils.trackers import PeriodicTracker, ThroughputTracker
