import time, jax, jax.numpy as jnp, numpy as np
x = jnp.ones((331000, 9), jnp.int32)
jax.block_until_ready(x)
t0=time.perf_counter(); a = np.asarray(x); print(f"D2H 12MB: {time.perf_counter()-t0:.2f}s")
y = jnp.ones((331000,), jnp.int32); jax.block_until_ready(y)
t0=time.perf_counter(); b = np.asarray(y); print(f"D2H 1.3MB: {time.perf_counter()-t0:.2f}s")
big = np.ones((1,3,512,1024), np.float32)
t0=time.perf_counter(); z = jax.device_put(big); jax.block_until_ready(z); print(f"H2D 6MB: {time.perf_counter()-t0:.2f}s")
t0=time.perf_counter(); a = np.asarray(x); print(f"D2H 12MB again: {time.perf_counter()-t0:.2f}s")
