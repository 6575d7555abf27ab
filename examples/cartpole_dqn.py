"""Cartpole balance with a basic DQN — parity with the reference example
(examples/learning/cartpole_dqn.jl: BasicDQNLearner, discrete ±10 N force,
reward 1 − 0.1·θ², episode ends past the angle threshold).

TPU-native twist: the physics step, the Q-network update (flax MLP + optax,
Huber TD loss as in the reference), and the ε-greedy actor are one jitted
program each; the replay buffer is a fixed-shape device array (no Python
object store), so the whole training loop is two XLA graphs.

Defaults are sized for a CPU smoke run; raise episodes on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class QNet(nn.Module):
    n_actions: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(64)(x))
        x = nn.relu(nn.Dense(64)(x))
        return nn.Dense(self.n_actions)(x)


def main(episodes=30, buffer=4096, batch=64, gamma=0.99, lr=1e-3,
         eps0=0.9, eps1=0.05, force=10.0, seed=0):
    from dojo_tpu import envs

    env = envs.get_environment("cartpole_dqn")
    ny = env.state_dim

    net = QNet()
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    params = net.init(k0, jnp.zeros(ny))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    actions = jnp.asarray([-force, force])

    @jax.jit
    def act(params, y, eps, key):
        q = net.apply(params, y)
        greedy = jnp.argmax(q)
        key, k1, k2 = jax.random.split(key, 3)
        a = jnp.where(jax.random.uniform(k1) < eps,
                      jax.random.randint(k2, (), 0, 2), greedy)
        return a, key

    @jax.jit
    def td_update(params, opt_state, s, a, r, done, s2):
        def loss_fn(p):
            q = net.apply(p, s)[jnp.arange(s.shape[0]), a]
            q2 = jnp.max(net.apply(params, s2), axis=-1)
            target = r + gamma * (1.0 - done) * q2
            return jnp.mean(optax.huber_loss(q, jax.lax.stop_gradient(target)))

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    # fixed-shape replay buffer
    S = np.zeros((buffer, ny), np.float32)
    A = np.zeros(buffer, np.int32)
    R = np.zeros(buffer, np.float32)
    D = np.zeros(buffer, np.float32)
    S2 = np.zeros((buffer, ny), np.float32)
    n, ptr = 0, 0
    rng = np.random.default_rng(seed)

    returns = []
    for ep in range(episodes):
        # small random start near upright (reference reset!: ±0.05)
        y = env.reset(position=float(rng.uniform(-0.05, 0.05)),
                      orientation=float(rng.uniform(-0.05, 0.05)))
        eps = eps0 + (eps1 - eps0) * ep / max(episodes - 1, 1)
        total = 0.0
        for t in range(env.horizon):
            a, key = act(params, y, eps, key)
            a = int(a)
            y2, r, done, info = env.step(y, np.asarray([float(actions[a])]))
            total += float(r)
            S[ptr], A[ptr], R[ptr] = np.asarray(y), a, float(r)
            D[ptr], S2[ptr] = float(bool(done)), np.asarray(y2)
            ptr = (ptr + 1) % buffer
            n = min(n + 1, buffer)
            if n >= batch:
                idx = rng.integers(0, n, size=batch)
                params, opt_state, loss = td_update(
                    params, opt_state, jnp.asarray(S[idx]), jnp.asarray(A[idx]),
                    jnp.asarray(R[idx]), jnp.asarray(D[idx]), jnp.asarray(S2[idx]),
                )
            y = y2
            if bool(done):
                break
        returns.append(total)
        print(f"episode {ep}: return {total:.1f}  steps {t + 1}  eps {eps:.2f}")
    return returns


if __name__ == "__main__":
    main()
