from tdgp.metrics.registry import calc_metric, report_metric, list_metrics
