from .config import ConfigRead, GlobalConfig, yaml_config, parse_timestamp
from .time_manager import Clock, OneTimeAlarm, PeriodicAlarm, mpas_create_clock

__all__ = [
    "ConfigRead",
    "GlobalConfig",
    "yaml_config",
    "parse_timestamp",
    "Clock",
    "OneTimeAlarm",
    "PeriodicAlarm",
    "mpas_create_clock",
]
