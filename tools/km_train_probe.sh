#!/bin/bash
# One short keymatch training chunk against the EXISTING r4d run dir —
# same config (10000-step schedule) so the XLA disk cache hits; exits
# after 25 steps. Crash probe for the relay's long-dispatch limit.
set -u
cd /root/repo
python - <<'EOF'
import sys
sys.path.insert(0, '/root/repo')
from automatic_as_built_reconstruction_tpu.train import train as t
state = t.train('/tmp/kitti_fhd_r4d/rehearsal.config', '/tmp/kitti_fhd_r4d',
                max_steps=26, display_step=5)
print('probe done at step', int(state['step']))
EOF
echo "probe rc=$?"
