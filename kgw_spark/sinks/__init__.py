"""Sinks: the partitioned table store and all file exporters."""
