from .ensemble import BetaScan
from .gauge import SU2PureGauge, SU3PureGauge, baseline_config

__all__ = ["BetaScan", "SU2PureGauge", "SU3PureGauge", "baseline_config"]
