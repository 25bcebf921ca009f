"""Config-system unit tests (mirrors reference test/infra/test_Config.jl and
its fixture test/infra/test.yaml)."""

from datetime import datetime, time, timedelta

import pytest
from dateutil.relativedelta import relativedelta

from mpas_ocean_tpu.infra.config import (
    ConfigGet,
    ConfigRead,
    parse_timestamp,
    yaml_config,
)

FIXTURE = """
omega:
  hmix:
    hmix_String: Restart_timestamp
    hmix_Float: 1.234567890
    hmix_None: none
    hmix_On: true
    hmix_Off: false
    hmix_Exp: 1.e25
  streams:
    intervals:
      yearly_interval:  0001-00-00_00:00:00
      monthly_interval: 0000-02-00_00:00:00
      daily_interval:   0000-00-03_00:00:00
      hourly_interval:  0000-00-00_04:00:00
      minutes_interval: 0000-00-00_00:05:00
      seconds_interval: 0000-00-00_00:00:06
    datetimes:
      NO_HMS:  0001-01-01_00:00:00
      ALL_HMS: 0001-01-01_02:03:04
"""


@pytest.fixture(scope="module")
def config(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "test.yaml"
    p.write_text(FIXTURE)
    return ConfigRead(p)


def test_namelist_scalars(config):
    hmix = ConfigGet(config.namelist, "hmix")
    assert ConfigGet(hmix, "hmix_String") == "Restart_timestamp"
    assert ConfigGet(hmix, "hmix_Float") == pytest.approx(1.23456789)
    assert ConfigGet(hmix, "hmix_None") == "none"
    assert ConfigGet(hmix, "hmix_On") is True
    assert ConfigGet(hmix, "hmix_Off") is False
    assert ConfigGet(hmix, "hmix_Exp") == pytest.approx(1e25)


def test_stream_intervals(config):
    iv = ConfigGet(ConfigGet(config.streams, "intervals"), "yearly_interval")
    assert iv == relativedelta(years=1)
    iv = ConfigGet(ConfigGet(config.streams, "intervals"), "monthly_interval")
    assert iv == relativedelta(months=2)
    intervals = ConfigGet(config.streams, "intervals")
    assert ConfigGet(intervals, "daily_interval") == timedelta(days=3)
    assert ConfigGet(intervals, "hourly_interval") == timedelta(hours=4)
    assert ConfigGet(intervals, "minutes_interval") == timedelta(minutes=5)
    assert ConfigGet(intervals, "seconds_interval") == timedelta(seconds=6)


def test_stream_datetimes(config):
    dts = ConfigGet(config.streams, "datetimes")
    assert ConfigGet(dts, "NO_HMS") == datetime(1, 1, 1, 0, 0, 0)
    assert ConfigGet(dts, "ALL_HMS") == datetime(1, 1, 1, 2, 3, 4)


def test_timestamp_forms():
    assert parse_timestamp("0001-01-01_02:03:04") == datetime(1, 1, 1, 2, 3, 4)
    assert parse_timestamp("02:03:04") == time(2, 3, 4)
    assert parse_timestamp("0_02:03:04") == time(2, 3, 4)
    # improvement over reference: combined interval parses instead of warning
    assert parse_timestamp("0000-00-03_04:30:00") == timedelta(days=3, hours=4, minutes=30)


def test_config_add_set():
    cfg = yaml_config({"a": 1})
    with pytest.raises(KeyError):
        cfg.add("a", 2)
    cfg.add("b", 3)
    with pytest.raises(KeyError):
        cfg.set("zzz", 0)
    with pytest.warns(UserWarning):
        cfg.set("b", "now-a-string")
    assert cfg.get("b") == "now-a-string"
