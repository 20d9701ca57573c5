#!/bin/bash
# Download the 12-model pretrained zoo (reference: setup/download_weights.sh:1-56).
# The checkpoints are the reference's own PyTorch files; the framework's
# converter (models/convert.py) turns them into flax variables at load time
# via fetch_model(name, pretrained_path="pretrained_models").
set -e
mkdir -p pretrained_models
cd pretrained_models

URL_BASE="https://lmb.informatik.uni-freiburg.de/resources/binaries/cvpr22_adv_flow"
download () { wget --no-check-certificate "$URL_BASE/$1.pth"; }

download RobustFlowNetC
download larger_field_3x3_x0_l2
download raft_flowNetCEnc_noSeparateContext
download adv_kitti2012_robustFlow_ifgsm_l2_0.02
download adv_kitti2012_pwcnet_ifgsm_l2_0.02
download adv_kitti2012_raft_ifgsm_l2_0.02

# FlowNetC / FlowNetS / FlowNet2 (flownet2-pytorch checkpoints)
gdown "https://drive.google.com/u/0/uc?id=1BFT6b7KgKJC8rA59RmOVAXRM_S7aSfKE"
gdown "https://drive.google.com/u/0/uc?id=1V61dZjFomwlynwlYklJHC-TLfdFom3Lg"
gdown "https://drive.google.com/u/0/uc?id=1hF8vS6YeHkx3j2pfCeQqqZGwA_PJq_Da"

# PWC-Net
wget "https://github.com/NVlabs/PWC-Net/blob/master/PyTorch/pwc_net_chairs.pth.tar?raw=true" \
  -O pwc_net_chairs.pth.tar

# RAFT
wget --no-check-certificate https://raw.githubusercontent.com/princeton-vl/RAFT/master/download_models.sh
bash download_models.sh && mv models/* . && rmdir models && rm -f models.zip download_models.sh

# SPyNet per-level weights
git clone https://github.com/anuragranj/flowattack.git
mv flowattack/models/spynet_models/ . && rm -rf flowattack/

cd ..
