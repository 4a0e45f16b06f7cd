"""Create random-weight demo checkpoints + a test image for CLI drives."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax, cv2
from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig, cmpnet_init
from pseudocylindrical_convolution_tpu.utils.checkpoint import save_params
cfg = CMPNetConfig(valid_dim=56)
params = cmpnet_init(jax.random.PRNGKey(0), cfg)
save_params(params, "demo/mse/1_56.pkl")
print("wrote demo/mse/1_56.pkl")
# synthetic ERP test image: smooth gradients + texture
h, w = 512, 1024
yy, xx = np.mgrid[0:h, 0:w]
img = np.stack([
    128 + 100*np.sin(2*np.pi*xx/w*3) * np.cos(np.pi*yy/h),
    128 + 80*np.cos(2*np.pi*xx/w*5),
    128 + 60*np.sin(np.pi*yy/h*2),
], axis=-1)
rng = np.random.RandomState(0)
img = np.clip(img + rng.randn(h, w, 3)*8, 0, 255).astype(np.uint8)
cv2.imwrite("/tmp/test_erp.png", img)
print("wrote /tmp/test_erp.png")
