"""Post-fix check: the benched full train step (aug + fwd/bwd + adam)."""
import json, sys
sys.path.insert(0, "/root/repo")
from bench import bench_verifier_train_step
print(json.dumps(bench_verifier_train_step()))
