import time, jax, jax.numpy as jnp, numpy as np
for mb, shape in [(0.1, (25000,)), (1, (250000,)), (4, (1000000,)), (12, (3000000,)), (12, (331000, 9))]:
    x = jax.random.randint(jax.random.PRNGKey(int(mb*10)+shape[0]%7), shape, 0, 100, jnp.int32)
    jax.block_until_ready(x)
    t0=time.perf_counter(); a = np.asarray(x); dt=time.perf_counter()-t0
    print(f"D2H {mb}MB {shape}: {dt:.3f}s ({mb/dt:.1f} MB/s)")
