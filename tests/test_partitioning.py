"""Byte-driven partitioning policy (kgw_spark/plans/partitioning.py).

The invariant under test is the one the scaling record depends on: the
conf dict is a pure function of input bytes — identical at every
parallelism level — and scales with data volume, not cluster size.
"""

import os

from kgw_spark.plans.partitioning import (
    MIN_SHUFFLE_PARTITIONS,
    SHUFFLE_TARGET_BYTES,
    byte_driven_conf,
    dir_bytes,
)


def test_conf_is_pure_function_of_bytes():
    a = byte_driven_conf(71 * 1024 * 1024)
    b = byte_driven_conf(71 * 1024 * 1024)
    assert a == b
    # no key depends on core count: the dict pins every knob Spark
    # would otherwise derive from defaultParallelism
    assert a["spark.sql.files.minPartitionNum"] == "1"
    assert int(a["spark.sql.files.maxPartitionBytes"]) > 0


def test_shuffle_partitions_scale_with_bytes():
    small = int(byte_driven_conf(10 * 1024 * 1024)["spark.sql.shuffle.partitions"])
    one_x = int(byte_driven_conf(71 * 1024 * 1024)["spark.sql.shuffle.partitions"])
    ten_x = int(byte_driven_conf(710 * 1024 * 1024)["spark.sql.shuffle.partitions"])
    assert small == MIN_SHUFFLE_PARTITIONS  # utilization floor
    assert one_x >= MIN_SHUFFLE_PARTITIONS
    assert one_x % MIN_SHUFFLE_PARTITIONS == 0  # wave-even quantum
    assert ten_x % MIN_SHUFFLE_PARTITIONS == 0
    # 10x the data -> ~10x the partitions once above the floor
    assert 5 * one_x <= ten_x <= 15 * one_x
    # partition payload stays near the target at scale (quantum
    # rounding bounds the deviation by one quantum)
    est = 710 * 1024 * 1024 * 2.2
    assert est / ten_x <= SHUFFLE_TARGET_BYTES * 1.6


def test_dir_bytes_skips_markers(tmp_path):
    (tmp_path / "part-0.parquet").write_bytes(b"x" * 100)
    (tmp_path / "_SUCCESS").write_bytes(b"y" * 50)
    (tmp_path / ".hidden.crc").write_bytes(b"z" * 50)
    sub = tmp_path / "type=calls"
    os.makedirs(sub)
    (sub / "part-1.parquet").write_bytes(b"x" * 25)
    assert dir_bytes(str(tmp_path)) == 125
