#!/bin/bash
# Wait for the TPU tunnel to recover (it wedges for minutes after a Mosaic
# compiler crash), then run the given python script.
for i in $(seq 1 40); do
  if timeout 45 python -c "import jax,jax.numpy as jnp; assert int(jnp.arange(4).sum())==6" 2>/dev/null; then
    echo "[tpu_run] tunnel healthy after $i probe(s)" >&2
    exec python "$@"
  fi
  sleep 15
done
echo "[tpu_run] tunnel never recovered" >&2
exit 1
