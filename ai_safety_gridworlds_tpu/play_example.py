"""Human-play CLI for the ported pycolab example games.

``python -m ai_safety_gridworlds_tpu.play_example -e <game>``

The reference ships every pycolab example as a standalone playable program
(``pycolab/examples/*.py`` ``main()`` functions with per-game
``keys_to_actions`` maps and ``CursesUi``); this module is the single
equivalent entry point over the functional game classes. Key maps,
repainters, and delays mirror each reference example's ``main`` (cited in
the table below).

``--headless N`` steps a uniform-random policy for N steps and prints the
final ASCII frame instead of starting curses — the scriptable smoke-check
used by tests and verification.
"""

from __future__ import annotations

import argparse
import importlib

import jax
import jax.numpy as jnp
import numpy as np

_ARROWS = {"KEY_UP": 0, "KEY_DOWN": 1, "KEY_LEFT": 2, "KEY_RIGHT": 3}


def _keymap(**kw):
    """Keys are curses attribute names (resolved lazily), single chars, or
    -1 (the getch timeout pseudo-key)."""
    return kw


# game -> (module, class name, keys_to_actions, delay ms, ctor kwargs names)
# Key maps cite the reference example's main().
GAMES = {
    # pycolab/examples/scrolly_maze.py:373-377
    "scrolly_maze": ("scrolly_maze", "ScrollyMaze",
                     dict(_ARROWS, **{"-1": 4, "q": 5, "Q": 5}), 100),
    # pycolab/examples/better_scrolly_maze.py:333-338
    "better_scrolly_maze": ("better_scrolly_maze", "BetterScrollyMaze",
                            dict(_ARROWS, **{"-1": 4, "q": 5, "Q": 5}), 100),
    # pycolab/examples/warehouse_manager.py:308-314
    "warehouse_manager": ("warehouse_manager", "WarehouseManager",
                          dict(_ARROWS, **{"-1": 4, "q": 5, "Q": 5}), 100),
    # pycolab/examples/extraterrestrial_marauders.py:271-276
    "extraterrestrial_marauders": (
        "extraterrestrial_marauders", "ExtraterrestrialMarauders",
        {"KEY_LEFT": 0, "KEY_RIGHT": 1, " ": 2, "-1": 3, "q": 4}, 300),
    # pycolab/examples/research/box_world/box_world.py:461-468
    "box_world": ("box_world", "BoxWorld",
                  {"w": 0, "s": 1, "a": 2, "d": 3, "-1": 4}, 50),
    # pycolab/examples/shockwave.py:197-206
    "shockwave": ("shockwave", "Shockwave",
                  {"KEY_UP": 0, "KEY_LEFT": 1, "KEY_RIGHT": 2, "-1": 3}, 500),
    # pycolab/examples/aperture.py:229-241
    "aperture": ("aperture", "Aperture",
                 dict(_ARROWS, **{"-1": 4, "w": 5, "a": 6, "s": 7, "d": 8,
                                  "q": 9, "Q": 9}), 100),
    # pycolab/examples/fluvial_natation.py:127-128
    "fluvial_natation": ("fluvial_natation", "FluvialNatation",
                         {"KEY_LEFT": 0, "KEY_RIGHT": 1, "-1": 2}, 200),
    # pycolab/examples/hello_world.py:137-139
    "hello_world": ("hello_world", "HelloWorld",
                    dict(_ARROWS, **{"q": 4, "Q": 4, "-1": 5}), 50),
    # pycolab/examples/apprehend.py:146-148
    "apprehend": ("apprehend", "Apprehend",
                  {"KEY_LEFT": 0, "KEY_RIGHT": 1, "-1": 2}, 500),
    # pycolab/examples/classics/*.py:78-96
    "four_rooms": ("classics", "FourRooms",
                   dict(_ARROWS, **{"-1": 4}), 200),
    "cliff_walk": ("classics", "CliffWalk",
                   dict(_ARROWS, **{"-1": 4}), 200),
    "chain_walk": ("classics", "ChainWalk",
                   {"KEY_LEFT": 0, "KEY_RIGHT": 1, "-1": 2}, 200),
    # pycolab/examples/research/lp-rnn/cued_catch.py:332-335
    "cued_catch": ("cued_catch", "CuedCatch",
                   {"KEY_UP": 1, "KEY_DOWN": 2, "-1": 3, "q": 4, "Q": 4},
                   200),
    # pycolab/examples/research/lp-rnn/sequence_recall.py:336-340
    "sequence_recall": ("sequence_recall", "SequenceRecall",
                        {"KEY_UP": 1, "KEY_DOWN": 2, "KEY_LEFT": 3,
                         "KEY_RIGHT": 4, "-1": 5, "q": 6, "Q": 6}, 100),
    # pycolab/examples/research/lp-rnn/t_maze.py:523-528
    "t_maze": ("t_maze", "TMaze",
               {"KEY_UP": 1, "KEY_DOWN": 2, "KEY_LEFT": 3, "KEY_RIGHT": 4,
                "-1": 5, "q": 6, "Q": 6}, 100),
    # pycolab/examples/tennnnnnnnnnnnnnnnnnnnnnnnis.py:187-194 — paired
    # per-player actions (r/f player 1, u/j player 2; STAY=0 UP=1 DOWN=2).
    "tennis": ("tennis", "Tennis",
               {"r": (1, 0), "f": (2, 0), "u": (0, 1), "j": (0, 2),
                "q": (3, 3), "-1": (0, 0)}, 33),
}


def build_env(name: str, **kwargs):
    module_name, class_name, keys, delay = GAMES[name]
    module = importlib.import_module(
        f"ai_safety_gridworlds_tpu.envs.{module_name}"
    )
    return getattr(module, class_name)(**kwargs), module, keys, delay


def ascii_rows(env, state) -> list:
    board = np.asarray(env.board(state))
    return ["".join(chr(c) for c in row) for row in board]


class CropperViews:
    """Side-by-side cropped display windows, as the reference ``CursesUi``
    shows a game's croppers (``human_ui.py:312-346``). Falls back to the
    full board for games without croppers."""

    def __init__(self, env):
        self.croppers = (
            env.make_croppers() if hasattr(env, "make_croppers") else None
        )
        self.corners = [None] * len(self.croppers or [])

    def reset(self):
        self.corners = [None] * len(self.corners)

    def render(self, env, state) -> list:
        if not self.croppers:
            return ascii_rows(env, state)
        board = np.asarray(env.board(state))
        pos = None
        for field in ("pos", "ball"):  # scrolling croppers track the player
            if hasattr(state, field):  # (or tennis's ball)
                pos = np.asarray(getattr(state, field)).reshape(-1)[:2]
                break
        panels = []
        for i, cropper in enumerate(self.croppers):
            try:
                out = cropper.crop(
                    board, position=pos, corner=self.corners[i]
                )
            except (TypeError, ValueError):
                out = cropper.crop(board)
            if isinstance(out, tuple):
                win, self.corners[i] = out
            else:
                win = out
            panels.append(
                ["".join(chr(c) for c in row) for row in np.asarray(win)]
            )
        height = max(len(p) for p in panels)
        widths = [max(len(r) for r in p) for p in panels]
        return [
            "   ".join(
                (p[y] if y < len(p) else "").ljust(w)
                for p, w in zip(panels, widths)
            )
            for y in range(height)
        ]


def _story_rows(ts) -> list:
    board = np.asarray(ts.observation["ascii_codes"])
    return ["".join(chr(c) for c in row) for row in board]


def headless_rollout(name: str, steps: int, seed: int = 0, **kwargs):
    """Random-policy rollout; returns (frames printed last, total reward)."""
    if name == "ordeal":
        # Story-based game (``ordeal.py:263-281``): drive the multi-chapter
        # Story shell; the Kansas chapter renders through its scroll window.
        from ai_safety_gridworlds_tpu.envs.ordeal import make_ordeal_story

        story = make_ordeal_story()
        ts = story.its_showtime()
        total, rng = 0.0, np.random.RandomState(seed)
        for _ in range(steps):
            ts = story.play(int(rng.randint(0, 4)))
            total += float(ts.reward or 0.0)
            if story.game_over:
                ts = story.its_showtime()
        return _story_rows(ts), total
    env, module, _, _ = build_env(name, **kwargs)
    views = CropperViews(env)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    state = env.initial_state(sub)
    step = jax.jit(env.step)
    total, rng = 0.0, np.random.RandomState(seed)
    for _ in range(steps):
        if name == "tennis":
            action = jnp.asarray(rng.randint(0, 3, size=2), jnp.int32)
        else:
            action = jnp.int32(rng.randint(env.action_min, env.action_max + 1))
        state, out = step(state, action)
        views.render(env, state)  # advance scrolling-window corners
        total += float(np.sum(np.asarray(out.reward)))
        if bool(out.game_over):
            key, sub = jax.random.split(key)
            state = env.initial_state(sub)
            views.reset()
    return views.render(env, state), total


def _resolve_keys(keys: dict) -> dict:
    import curses

    out = {}
    for k, action in keys.items():
        if k == "-1":
            out[-1] = action
        elif len(k) > 1:
            out[getattr(curses, k)] = action
        else:
            out[k] = action
    return out


def play(name: str, seed: int = 0, **kwargs):
    """Interactive curses loop (the reference example's ``main``)."""
    import curses

    if name == "ordeal":
        _play_story(seed)
        return
    env, module, keys, delay = build_env(name, **kwargs)
    views = CropperViews(env)
    keys = _resolve_keys(keys)
    key = jax.random.PRNGKey(seed)
    step = jax.jit(env.step)

    def loop(screen):
        nonlocal key
        curses.curs_set(0)
        screen.timeout(delay)
        key_, sub = jax.random.split(key)
        state = env.initial_state(sub)
        total = 0.0
        while True:
            screen.erase()
            for y, row in enumerate(views.render(env, state)):
                try:
                    screen.addstr(y, 0, row)
                except Exception:
                    pass
            try:
                screen.addstr(
                    env.board(state).shape[0] + 1, 0, f"Return: {total:g}"
                )
            except Exception:
                pass
            screen.refresh()
            ch = screen.getch()
            if ch == 27:
                return
            name_ = chr(ch) if 0 <= ch < 256 else ch
            action = None
            for cand in (ch, name_):
                if cand in keys:
                    action = keys[cand]
                    break
            if action is None and -1 in keys:
                action = keys[-1]
            if action is None:
                continue
            action = (
                jnp.asarray(action, jnp.int32)
                if isinstance(action, tuple)
                else jnp.int32(action)
            )
            state, out = step(state, action)
            total += float(np.sum(np.asarray(out.reward)))
            if bool(out.game_over):
                key_, sub = jax.random.split(key_)
                state = env.initial_state(sub)
                views.reset()
                total = 0.0

    curses.wrapper(loop)


def _play_story(seed: int = 0):
    """Interactive loop for the ordeal Story (reference keys:
    arrows -> 0..3, 'q' -> 4 quit, timeout -> no step,
    ``ordeal.py:276-280``)."""
    import curses

    from ai_safety_gridworlds_tpu.envs.ordeal import make_ordeal_story

    keys = dict(_ARROWS, **{"q": 4, "Q": 4})
    keys = _resolve_keys(keys)

    def loop(screen):
        curses.curs_set(0)
        screen.timeout(200)
        story = make_ordeal_story()
        ts = story.its_showtime()
        total = 0.0
        while True:
            screen.erase()
            rows = _story_rows(ts)
            for y, row in enumerate(rows):
                try:
                    screen.addstr(y, 0, row)
                except Exception:
                    pass
            try:
                screen.addstr(len(rows) + 1, 0, f"Return: {total:g}")
            except Exception:
                pass
            screen.refresh()
            ch = screen.getch()
            if ch == 27:
                return
            if ch == -1:
                continue  # reference maps the timeout to no action
            name_ = chr(ch) if 0 <= ch < 256 else ch
            action = keys.get(ch, keys.get(name_))
            if action is None:
                continue
            ts = story.play(int(action))
            total += float(ts.reward or 0.0)
            if story.game_over:
                story = make_ordeal_story()
                ts = story.its_showtime()
                total = 0.0

    curses.wrapper(loop)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-e", "--environment", required=True,
                        choices=sorted(GAMES) + ["ordeal"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--level", type=int, default=None)
    parser.add_argument("--headless", type=int, default=None, metavar="N",
                        help="run N random steps and print the final frame")
    args = parser.parse_args(argv)
    kwargs = {}
    if args.level is not None:
        kwargs["level"] = args.level
    if args.headless is not None:
        rows, total = headless_rollout(
            args.environment, args.headless, args.seed, **kwargs
        )
        print("\n".join(rows))
        print(f"Return: {total:g}")
        return
    play(args.environment, args.seed, **kwargs)


if __name__ == "__main__":
    main()
