/* Browser-environment stub for executing the FULL web client (app.js)
 * under the jsmini interpreter (mixlab_tpu/utils/jsmini.py).
 *
 * The reference frontend ran in real browsers (frontend/src/lib.rs:27-106);
 * this image has no JS runtime or browser, so the DOM / canvas-2D / MSE /
 * WebMIDI / WebSocket surfaces the client touches are reimplemented here as
 * RECORDING fakes: DOM mutations build a real element tree, canvas contexts
 * record their draw ops, MediaSource records appended segments, WebSocket
 * instances are registries the test feeds real server traffic into.
 *
 * Written in the jsmini subset: factory functions + closures (no classes,
 * no regex, no property getters — property SETTERS use jsmini's
 * `__setters__` accessor hook, needed for `el.innerHTML = ...`).
 *
 * The test driver (tests/test_frontend_app_dom.py) interacts through the
 * `__env` global: sockets, fetches, object URLs, fire(), q()/qa().
 */
"use strict";

const __envState = {
  sockets: [],        // FakeWebSocket instances, in creation order
  fetches: [],        // [url, opts]
  objectURLs: [],     // objects passed to URL.createObjectURL
  sourceBuffers: [],  // MSE SourceBuffer fakes
  midiInputs: [],     // fake WebMIDI inputs
  storage: new Map(), // localStorage backing
  timersRan: 0,
};

/* ------------------------------------------------------------- elements */

const VOID_TAGS = new Set();
for (const t of ["input", "br", "img", "hr", "meta", "link"]) VOID_TAGS.add(t);

function hasClass(el, cls) {
  if (!el || !el.className) return false;
  const parts = String(el.className).split(" ");
  for (const p of parts) if (p === cls) return true;
  return false;
}

function makeElement(tag) {
  const el = {
    tagName: String(tag).toLowerCase(),
    className: "",
    id: "",
    textContent: "",
    title: "",
    value: "",
    children: [],
    childElementCount: 0,
    dataset: {},
    style: {},
    attrs: {},
    __parent: null,
    __listeners: {},
    __rect: null,
  };

  el.classList = {
    contains: (c) => hasClass(el, c),
    add: (c) => {
      if (!hasClass(el, c)) el.className = (el.className ? el.className + " " : "") + c;
    },
    remove: (c) => {
      el.className = String(el.className).split(" ").filter((p) => p !== c).join(" ");
    },
    toggle: (c, force) => {
      const want = force === undefined ? !hasClass(el, c) : force;
      if (want) el.classList.add(c);
      else el.classList.remove(c);
      return want;
    },
  };

  const recount = () => {
    let n = 0;
    for (const c of el.children) if (typeof c !== "string") n += 1;
    el.childElementCount = n;
  };

  el.appendChild = (child) => {
    if (typeof child !== "string" && child.__parent) child.__parent.removeChild(child);
    el.children.push(child);
    if (typeof child !== "string") child.__parent = el;
    recount();
    return child;
  };
  el.append = (...nodes) => {
    for (const n of nodes) el.appendChild(n);
  };
  el.prepend = (...nodes) => {
    for (let i = nodes.length - 1; i >= 0; i--) {
      const n = nodes[i];
      if (typeof n !== "string" && n.__parent) n.__parent.removeChild(n);
      el.children.unshift(n);
      if (typeof n !== "string") n.__parent = el;
    }
    recount();
  };
  el.removeChild = (child) => {
    const i = el.children.indexOf(child);
    if (i >= 0) el.children.splice(i, 1);
    if (typeof child !== "string") child.__parent = null;
    recount();
    return child;
  };
  el.remove = () => {
    if (el.__parent) el.__parent.removeChild(el);
  };
  el.replaceWith = (other) => {
    const p = el.__parent;
    if (!p) return;
    const i = p.children.indexOf(el);
    p.children.splice(i, 1, other);
    other.__parent = p;
    el.__parent = null;
  };

  el.setAttribute = (name, v) => {
    el.attrs[name] = v;
    if (name === "class") el.className = v;
    if (name === "id") el.id = v;
  };
  el.getAttribute = (name) => (name in el.attrs ? el.attrs[name] : null);

  el.addEventListener = (type, fn) => {
    if (!el.__listeners[type]) el.__listeners[type] = [];
    el.__listeners[type].push(fn);
  };
  el.removeEventListener = (type, fn) => {
    const ls = el.__listeners[type];
    if (ls) {
      const i = ls.indexOf(fn);
      if (i >= 0) ls.splice(i, 1);
    }
  };
  el.setPointerCapture = () => undefined;
  el.releasePointerCapture = () => undefined;

  el.querySelector = (sel) => {
    const all = selectAll(el, sel);
    return all.length ? all[0] : null;
  };
  el.querySelectorAll = (sel) => selectAll(el, sel);

  el.getBoundingClientRect = () => rectOf(el);

  if (el.tagName === "canvas") {
    el.width = 0;
    el.height = 0;
    el._ops = [];
    const ctx = { canvas: el };
    for (const m of ["fillRect", "clearRect", "beginPath", "closePath",
                     "moveTo", "lineTo", "arc", "stroke", "fill"]) {
      ctx[m] = (...args) => {
        el._ops.push([m, ...args]);
      };
    }
    el.getContext = () => ctx;
  }

  // accessor hook (jsmini __setters__): innerHTML assignment mutates the tree
  el.__setters__ = {
    innerHTML: (html) => {
      el.children = [];
      el.childElementCount = 0;
      if (html !== "" && html !== null && html !== undefined) {
        parseHTMLInto(String(html), el);
      }
    },
  };
  return el;
}

/* --------------------------------------------------- HTML mini-parser */

function isNameChar(ch) {
  return (ch >= "a" && ch <= "z") || (ch >= "A" && ch <= "Z") ||
         (ch >= "0" && ch <= "9") || ch === "-" || ch === "_";
}

function parseHTMLInto(html, parent) {
  let i = 0;

  const parseNodes = (into) => {
    while (i < html.length) {
      if (html.charAt(i) === "<") {
        if (html.charAt(i + 1) === "/") {
          while (i < html.length && html.charAt(i) !== ">") i += 1;
          i += 1; // consume '>'
          return; // end of this element's content
        }
        if (html.charAt(i + 1) === "!") { // doctype/comment: skip to '>'
          while (i < html.length && html.charAt(i) !== ">") i += 1;
          i += 1;
          continue;
        }
        parseTag(into);
      } else {
        let j = i;
        while (j < html.length && html.charAt(j) !== "<") j += 1;
        const text = html.slice(i, j);
        if (text.trim() !== "") into.appendChild(text.trim());
        i = j;
      }
    }
  };

  const parseTag = (into) => {
    i += 1; // '<'
    let name = "";
    while (i < html.length && isNameChar(html.charAt(i))) {
      name += html.charAt(i);
      i += 1;
    }
    const el = makeElement(name);
    let selfClosed = false;
    while (i < html.length) {
      while (html.charAt(i) === " " || html.charAt(i) === "\n") i += 1;
      const ch = html.charAt(i);
      if (ch === ">") { i += 1; break; }
      if (ch === "/") { selfClosed = true; i += 1; continue; }
      let attr = "";
      while (i < html.length && isNameChar(html.charAt(i))) {
        attr += html.charAt(i);
        i += 1;
      }
      if (attr === "") {
        i += 1; // unknown character: always make progress
        continue;
      }
      let val = "";
      if (html.charAt(i) === "=") {
        i += 1; // '='
        const quote = html.charAt(i);
        if (quote === '"' || quote === "'") {
          i += 1;
          while (i < html.length && html.charAt(i) !== quote) {
            val += html.charAt(i);
            i += 1;
          }
          i += 1; // closing quote
        } else {
          while (i < html.length && isNameChar(html.charAt(i))) {
            val += html.charAt(i);
            i += 1;
          }
        }
      } else {
        val = "true"; // bare attribute (e.g. `multiple`)
      }
      applyAttr(el, attr, val);
    }
    into.appendChild(el);
    if (!selfClosed && !VOID_TAGS.has(el.tagName)) {
      parseNodes(el); // consumes the matching close tag
      // element text convenience: single text child -> textContent
      if (el.children.length === 1 && typeof el.children[0] === "string") {
        el.textContent = el.children[0];
      }
    }
  };

  parseNodes(parent);
}

function applyAttr(el, name, val) {
  if (name === "class") el.className = val;
  else if (name === "id") el.id = val;
  else if (name === "style") {
    for (const decl of val.split(";")) {
      const idx = decl.indexOf(":");
      if (idx > 0) {
        const k = decl.slice(0, idx).trim();
        el.style[k] = decl.slice(idx + 1).trim();
      }
    }
  } else if (name.startsWith("data-")) {
    el.dataset[name.slice(5)] = val;
  } else {
    el.attrs[name] = val;
    if (name === "value") el.value = val;
    if (name === "title") el.title = val;
    if (name === "type") el.type = val;
    if (name === "step") el.step = val;
    if (name === "min") el.min = val;
    if (name === "max") el.max = val;
    if (name === "placeholder") el.placeholder = val;
  }
}

/* ------------------------------------------------------ selector engine */

function parseSelectorPart(part) {
  // tag? (#id | .class | [attr="v"])*  — the subset the tests + app.js use
  const out = { tag: null, id: null, classes: [], attrs: [] };
  let i = 0;
  let tag = "";
  while (i < part.length && isNameChar(part.charAt(i))) {
    tag += part.charAt(i);
    i += 1;
  }
  if (tag !== "") out.tag = tag.toLowerCase();
  while (i < part.length) {
    const ch = part.charAt(i);
    if (ch === "#") {
      i += 1;
      let idv = "";
      while (i < part.length && isNameChar(part.charAt(i))) {
        idv += part.charAt(i);
        i += 1;
      }
      out.id = idv;
    } else if (ch === ".") {
      i += 1;
      let cls = "";
      while (i < part.length && isNameChar(part.charAt(i))) {
        cls += part.charAt(i);
        i += 1;
      }
      out.classes.push(cls);
    } else if (ch === "[") {
      i += 1;
      let name = "";
      while (i < part.length && isNameChar(part.charAt(i))) {
        name += part.charAt(i);
        i += 1;
      }
      let val = null;
      if (part.charAt(i) === "=") {
        i += 1;
        if (part.charAt(i) === '"') {
          i += 1;
          val = "";
          while (i < part.length && part.charAt(i) !== '"') {
            val += part.charAt(i);
            i += 1;
          }
          i += 1;
        }
      }
      if (part.charAt(i) === "]") i += 1;
      out.attrs.push([name, val]);
    } else {
      i += 1; // skip anything unexpected
    }
  }
  return out;
}

function matchPart(el, p) {
  if (typeof el === "string") return false;
  if (p.tag && el.tagName !== p.tag) return false;
  if (p.id !== null && el.id !== p.id) return false;
  for (const c of p.classes) if (!hasClass(el, c)) return false;
  for (const [name, val] of p.attrs) {
    let actual;
    if (name.startsWith("data-")) actual = el.dataset[name.slice(5)];
    else actual = el.getAttribute(name);
    if (actual === undefined || actual === null) return false;
    if (val !== null && String(actual) !== val) return false;
  }
  return true;
}

function walk(el, fn) {
  for (const c of el.children) {
    if (typeof c === "string") continue;
    fn(c);
    walk(c, fn);
  }
}

function selectAll(root, selector) {
  const parts = selector.trim().split(" ").filter((s) => s !== "").map(parseSelectorPart);
  let candidates = [];
  walk(root, (el) => candidates.push(el));
  // match last part, then require ancestors matching the earlier parts
  const out = [];
  for (const el of candidates) {
    if (!matchPart(el, parts[parts.length - 1])) continue;
    let ok = true;
    let node = el.__parent;
    for (let pi = parts.length - 2; pi >= 0; pi--) {
      while (node && !matchPart(node, parts[pi])) node = node.__parent;
      if (!node) { ok = false; break; }
      node = node.__parent;
    }
    if (ok) out.push(el);
  }
  return out;
}

/* -------------------------------------------------------------- layout */

function pxNum(v, dflt) {
  if (v === undefined || v === null || v === "") return dflt;
  const n = parseInt(v);
  return Number.isFinite(n) ? n : dflt;
}

function closestByClass(el, cls) {
  let node = el;
  while (node && !hasClass(node, cls)) node = node.__parent;
  return node;
}

function rectOf(el) {
  if (el.__rect) return el.__rect;
  const mk = (left, top, width, height) => ({
    left, top, width, height, right: left + width, bottom: top + height,
  });
  if (el.id === "workspace") return mk(0, 0, 1600, 1000);
  if (hasClass(el, "module")) {
    return mk(pxNum(el.style.left, 10), pxNum(el.style.top, 10), 180, 140);
  }
  if (hasClass(el, "term")) {
    const m = closestByClass(el, "module");
    const mr = m ? rectOf(m) : mk(0, 0, 0, 0);
    const idx = pxNum(el.dataset.idx, 0);
    const x = hasClass(el, "in") ? mr.left - 5 : mr.left + mr.width - 5;
    return mk(x, mr.top + 26 + idx * 16, 10, 10);
  }
  if (el.tagName === "canvas") {
    return mk(200, 200, el.width || 30, el.height || 30);
  }
  return mk(0, 0, 100, 20);
}

/* ---------------------------------------------------------------- events */

function makeEvent(type, props, target) {
  const ev = {
    type,
    target,
    clientX: 0,
    clientY: 0,
    buttons: 1,
    pointerId: 1,
    deltaY: 0,
    __stopped: false,
    __prevented: false,
  };
  if (props) for (const k of Object.keys(props)) ev[k] = props[k];
  ev.preventDefault = () => { ev.__prevented = true; };
  ev.stopPropagation = () => { ev.__stopped = true; };
  return ev;
}

function fire(el, type, props) {
  const ev = makeEvent(type, props, el);
  let node = el;
  while (node && !ev.__stopped) {
    const ls = node.__listeners ? node.__listeners[type] : null;
    if (ls) {
      for (const f of ls.slice()) {
        f(ev);
        if (ev.__stopped) break;
      }
    }
    if (!ev.__stopped) {
      const h = node["on" + type];
      if (h) h(ev);
    }
    node = node.__parent;
  }
  return ev;
}

/* ------------------------------------------------------------- document */

const __docRoot = makeElement("body");

const document = {
  body: __docRoot,
  createElement: (tag) => makeElement(tag),
  createElementNS: (ns, tag) => makeElement(tag),
  getElementById: (id) => {
    let found = null;
    walk(__docRoot, (el) => {
      if (!found && el.id === id) found = el;
    });
    return found;
  },
  querySelector: (sel) => {
    const all = selectAll(__docRoot, sel);
    return all.length ? all[0] : null;
  },
  querySelectorAll: (sel) => selectAll(__docRoot, sel),
  addEventListener: (type, fn) => {
    if (!__docRoot.__listeners[type]) __docRoot.__listeners[type] = [];
    __docRoot.__listeners[type].push(fn);
  },
};

/* --------------------------------------------------------- window & co. */

const location = { host: "testhost" };

const localStorage = {
  getItem: (k) => (__envState.storage.has(k) ? __envState.storage.get(k) : null),
  setItem: (k, v) => { __envState.storage.set(k, String(v)); },
  removeItem: (k) => { __envState.storage.delete(k); },
};

function AudioContext() {
  this.currentTime = 0;
  this.destination = { __sink: true };
  this.createBuffer = (channels, frames, rate) => {
    const chans = [];
    for (let c = 0; c < channels; c++) {
      const arr = [];
      for (let i = 0; i < frames; i++) arr.push(0);
      chans.push(arr);
    }
    return { numberOfChannels: channels, length: frames, sampleRate: rate,
             getChannelData: (c) => chans[c], __chans: chans };
  };
  this.createBufferSource = () => {
    const src = { buffer: null, started: null };
    src.connect = () => undefined;
    src.start = (when) => { src.started = when; };
    return src;
  };
}

const window = {
  AudioContext,
  addEventListener: (type, fn) => document.addEventListener(type, fn),
};

function WebSocket(url) {
  this.url = url;
  this.sent = [];
  this.closed = false;
  this.binaryType = "";
  this.onmessage = null;
  this.onclose = null;
  this.onopen = null;
  this.send = (data) => { this.sent.push(data); };
  this.close = () => { this.closed = true; };
  __envState.sockets.push(this);
}

function MediaSource() {
  const mse = this;
  this.__sb = null;
  this.addEventListener = (type, fn) => {
    if (type === "sourceopen") fn(); // stub: source opens as soon as observed
  };
  this.addSourceBuffer = (mime) => {
    const sb = {
      mime,
      updating: false,
      appended: [],
      __l: {},
    };
    sb.addEventListener = (type, fn) => {
      if (!sb.__l[type]) sb.__l[type] = [];
      sb.__l[type].push(fn);
    };
    sb.appendBuffer = (buf) => {
      sb.appended.push(buf);
      const ls = sb.__l["updateend"];
      if (ls) for (const f of ls.slice()) f();
    };
    mse.__sb = sb;
    __envState.sourceBuffers.push(sb);
    return sb;
  };
}

const URL = {
  createObjectURL: (obj) => {
    __envState.objectURLs.push(obj);
    return "blob:" + __envState.objectURLs.length;
  },
  revokeObjectURL: () => undefined,
};

function Blob(parts, opts) {
  this.parts = parts;
  this.type = opts && opts.type ? opts.type : "";
}

function Option(text, value) {
  const el = makeElement("option");
  el.textContent = text === undefined ? "" : text;
  el.value = value === undefined ? "" : value;
  return el;
}

/* typed-array + text decoding fakes: byte payloads travel as plain arrays
 * of numbers; Uint8Array wraps them with the view API the client uses */

function Uint8Array(data, byteOffset, length) {
  const off = byteOffset === undefined ? 0 : byteOffset;
  const len = length === undefined ? data.length - off : length;
  this.buffer = data;
  this.byteOffset = off;
  this.byteLength = len;
  this.length = len;
  this.indexOf = (v) => {
    for (let i = 0; i < len; i++) if (data[off + i] === v) return i;
    return -1;
  };
  this.subarray = (a, b) => {
    const end = b === undefined ? len : b;
    return new Uint8Array(data, off + a, end - a);
  };
}

function Int16Array(buffer, byteOffset, count) {
  // little-endian i16 view over the plain byte array
  const out = [];
  for (let i = 0; i < count; i++) {
    const lo = buffer[byteOffset + 2 * i];
    const hi = buffer[byteOffset + 2 * i + 1];
    let v = lo + hi * 256;
    if (v >= 32768) v -= 65536;
    out.push(v);
  }
  return out; // plain array: .length + [] reads work
}

function TextDecoder() {
  this.decode = (u8) => __bytesToStr(u8); // host helper (test-provided)
}

const navigator = {
  requestMIDIAccess: () => {
    const input = { onmidimessage: null, name: "fake-midi-in" };
    __envState.midiInputs.push(input);
    const inputs = new Map();
    inputs.set("in-0", input);
    return { inputs };
  },
};

const fetch = (url, opts) => {
  __envState.fetches.push([url, opts]);
  return { ok: true, status: 200 };
};

/* ------------------------------------------------------------- test API */

const __env = {
  state: __envState,
  document,
  fire,
  makeEvent,
  loadHTML: (bodyHtml) => {
    __docRoot.children = [];
    parseHTMLInto(bodyHtml, __docRoot);
  },
  fireDOMContentLoaded: () => {
    fire(__docRoot, "DOMContentLoaded", {});
  },
  q: (sel) => document.querySelector(sel),
  qa: (sel) => document.querySelectorAll(sel),
  byId: (id) => document.getElementById(id),
  rect: rectOf,
};
