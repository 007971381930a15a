"""Driver-facing pipelines: flagship encode→decode→verify + queries()."""
